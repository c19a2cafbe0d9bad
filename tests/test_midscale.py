"""Mid-scale (>=64k rows) CPU coverage of the hot paths.

The 1k-4k-row recall oracles cannot reach the size-gated layouts: the IVF
block-aligned storage switches on at KNOWHERE_IVF_ALIGN_MIN=32768 rows, the
HNSW inline-neighborhood store at >=100k rows, and sparse window pruning only
has something to skip with many windows. These tests exercise those layouts
at their NATURAL activation sizes (no env forcing).
"""

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.dataset import GenDataSetFromArray as DS

DIM, NQ, K = 32, 8, 10


def _corpus(nb, dim=DIM, seed=0):
    rng = np.random.default_rng(seed)
    xb = rng.standard_normal((nb, dim), dtype=np.float32)
    xq = xb[:NQ] + 0.01 * rng.standard_normal((NQ, dim)).astype(np.float32)
    return xb, xq


def _self_match(idx, xq, cfg):
    r = idx.Search(DS(xq), cfg, kt.BitsetView())
    assert r.has_value(), r.what()
    ids = r.value().ids.reshape(NQ, -1)
    return (ids[:, 0] == np.arange(NQ)).mean(), ids


def test_ivf_flat_aligned_layout_80k():
    """80k rows: the block-aligned list layout (pad-to-LIST_ALIGN) is active;
    queries perturbed from base rows must return their source row top-1."""
    xb, xq = _corpus(80_000)
    idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
    assert idx.Build(DS(xb), {"metric_type": "L2", "nlist": 128}) == kt.Status.success
    # the aligned layout really is in effect (offsets padded)
    node = idx.node
    assert int(node._offsets[-1]) > node._count, "expected padded aligned storage"
    sm, ids = _self_match(idx, xq, {"metric_type": "L2", "k": K, "nprobe": 16})
    assert sm == 1.0
    # bitset on the aligned layout: exclude the self rows
    filt = np.zeros(80_000, bool)
    filt[:NQ] = True
    r = idx.Search(DS(xq), {"metric_type": "L2", "k": K, "nprobe": 16},
                   kt.BitsetView.from_bool_array(filt))
    ids2 = r.value().ids.reshape(NQ, -1)
    assert not np.isin(ids2[ids2 >= 0], np.arange(NQ)).any()


def test_ivf_sq8_aligned_layout_80k():
    xb, xq = _corpus(80_000, seed=1)
    idx = kt.IndexFactory.Instance().Create("IVF_SQ8").value()
    assert idx.Build(DS(xb), {"metric_type": "L2", "nlist": 128}) == kt.Status.success
    sm, _ = _self_match(idx, xq, {"metric_type": "L2", "k": K, "nprobe": 16})
    assert sm >= 0.9, sm


def test_hnsw_inline_store_100k():
    """100k rows crosses the inline-neighborhood auto-gating threshold: the
    walk must run on the inline store (not the general fallback) and keep the
    recall contract."""
    xb, xq = _corpus(100_000, seed=2)
    idx = kt.IndexFactory.Instance().Create("HNSW").value()
    assert idx.Build(DS(xb), {"metric_type": "L2", "M": 8, "efConstruction": 48}) == kt.Status.success
    assert idx.node._inline is not None, "inline store should auto-build at >=100k rows"
    sm, _ = _self_match(idx, xq, {"metric_type": "L2", "k": K, "ef": 64})
    assert sm == 1.0


def test_sparse_pruned_64k():
    rng = np.random.default_rng(3)
    NDIM = 1024
    rows = []
    for i in range(64_000):
        t = (i * 32) // 64_000
        dims = (t * (NDIM // 32) + rng.integers(0, NDIM // 32, size=6)) % NDIM
        rows.append({int(d): float(rng.uniform(0.1, 2.0)) for d in np.unique(dims)})
    queries = rows[:4]

    def ds(rws):
        d = kt.DataSet()
        d.set("tensor", rws)
        d.is_sparse = True
        d.rows = len(rws)
        d.dim = NDIM
        return d

    idx = kt.IndexFactory.Instance().Create("SPARSE_INVERTED_INDEX", data_type="sparse").value()
    assert idx.Build(ds(rows), {"metric_type": "IP"}) == kt.Status.success
    c_exact = {"metric_type": "IP", "k": K, "search_algo": "TAAT_NAIVE"}
    c_wand = {"metric_type": "IP", "k": K, "search_algo": "DAAT_WAND",
              "sindi_window_size": 2048, "dim_max_score_ratio": 1.0}
    r0 = idx.Search(ds(queries), c_exact, kt.BitsetView()).value()
    r1 = idx.Search(ds(queries), c_wand, kt.BitsetView()).value()
    s0 = r0.distance.reshape(4, K); i0 = r0.ids.reshape(4, K)
    s1 = r1.distance.reshape(4, K); i1 = r1.ids.reshape(4, K)
    for q in range(4):
        assert set(i0[q][s0[q] > 0]) == set(i1[q][s1[q] > 0])
    st = idx.node._last_search_stats
    assert st["windows_scanned_a"] + st["windows_scanned_b"] < st["windows_total"]


def test_flat_streaming_scan_64k():
    xb, xq = _corpus(64_000, seed=4)
    idx = kt.IndexFactory.Instance().Create("FLAT").value()
    assert idx.Build(DS(xb), {"metric_type": "L2"}) == kt.Status.success
    sm, _ = _self_match(idx, xq, {"metric_type": "L2", "k": K})
    assert sm == 1.0
