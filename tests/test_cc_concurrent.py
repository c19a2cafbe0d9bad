"""Concurrent add-while-search (CC) semantics.

Reference contract: CC indexes accept Add DURING Search without blocking or
corrupting readers (src/index/ivf/ivf.cc:605-631, ConcurrentDirectMap;
tests/ut/test_ivfflat_cc.cc). Here the write path is copy-on-write epoch
appends with an off-lock merge + atomic swap; searches snapshot the epoch and
never block on a writer.
"""

import threading
import time

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.dataset import GenDataSetFromArray as DS


def _sparse_ds(rows):
    ds = kt.DataSet()
    ds.set("tensor", rows)
    ds.is_sparse = True
    ds.rows = len(rows)
    ds.dim = 64
    return ds


@pytest.mark.parametrize("name", ["IVF_FLAT_CC", "IVF_SQ_CC"])
def test_ivf_cc_add_during_search(name):
    rng = np.random.default_rng(3)
    dim = 32
    xb = rng.standard_normal((6000, dim), dtype=np.float32)
    xq = rng.standard_normal((8, dim), dtype=np.float32)
    cfg = {"metric_type": "L2", "k": 10, "nlist": 16, "nprobe": 16}

    idx = kt.IndexFactory.Instance().Create(name).value()
    assert idx.Build(DS(xb), cfg) == kt.Status.success

    stop = threading.Event()
    errors = []
    result_rows = []

    def searcher():
        while not stop.is_set():
            r = idx.Search(DS(xq), cfg, kt.BitsetView())
            if not r.has_value():
                errors.append(r.what())
                return
            ids = r.value().ids.reshape(8, -1)
            if (ids < 0).all():
                errors.append("all-invalid result")
                return
            result_rows.append(int(ids.max()))

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    # adds sized to cross the merge threshold several times — every merge is
    # an epoch swap racing the searcher snapshots
    total = 6000
    for _ in range(6):
        batch = rng.standard_normal((1500, dim), dtype=np.float32)
        assert idx.Add(DS(batch), cfg) == kt.Status.success
        total += 1500
        time.sleep(0.01)
    time.sleep(0.2)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors
    assert idx.Count() == total
    # added rows become visible to searches
    r = idx.Search(DS(xq), cfg, kt.BitsetView())
    assert r.has_value()
    # a query equal to a freshly added row must find it
    probe = batch[0:1]
    r2 = idx.Search(DS(probe), cfg, kt.BitsetView())
    ids2 = r2.value().ids.reshape(1, -1)
    assert ids2[0, 0] >= 0


def test_sparse_cc_add_during_search():
    rng = np.random.default_rng(5)

    def gen_rows(n, seed0):
        rws = []
        for i in range(n):
            nnz = int(rng.integers(3, 9))
            dims = rng.choice(64, size=nnz, replace=False)
            rws.append({int(d): float(rng.uniform(0.1, 2.0)) for d in dims})
        return rws

    base = gen_rows(3000, 0)
    queries = gen_rows(6, 1)
    cfg = {"metric_type": "IP", "k": 10}

    idx = kt.IndexFactory.Instance().Create("SPARSE_INVERTED_INDEX_CC", data_type="sparse").value()
    assert idx.Build(_sparse_ds(base), cfg) == kt.Status.success

    stop = threading.Event()
    errors = []

    def searcher():
        while not stop.is_set():
            r = idx.Search(_sparse_ds(queries), cfg, kt.BitsetView())
            if not r.has_value():
                errors.append(r.what())
                return

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    total = 3000
    for _ in range(5):
        batch = gen_rows(900, 2)
        assert idx.Add(_sparse_ds(batch), cfg) == kt.Status.success
        total += 900
        time.sleep(0.01)
    time.sleep(0.1)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors
    assert idx.Count() == total
    # a freshly added row is findable: query = the row itself
    probe = [batch[0]]
    r = idx.Search(_sparse_ds(probe), cfg, kt.BitsetView())
    ids = r.value().ids.reshape(1, -1)
    assert (ids >= 0).any()


def test_sparse_pending_scores_match_merged():
    """Search results over an un-merged pending segment equal the results
    after the segment merges (epoch read path is exact, not approximate)."""
    rng = np.random.default_rng(11)

    def gen_rows(n):
        rws = []
        for _ in range(n):
            nnz = int(rng.integers(3, 9))
            dims = rng.choice(48, size=nnz, replace=False)
            rws.append({int(d): float(rng.uniform(0.1, 2.0)) for d in dims})
        return rws

    base = gen_rows(400)
    extra = gen_rows(50)  # below the merge threshold -> stays pending
    queries = gen_rows(4)
    cfg = {"metric_type": "IP", "k": 8}

    idx = kt.IndexFactory.Instance().Create("SPARSE_INVERTED_INDEX_CC", data_type="sparse").value()
    assert idx.Build(_sparse_ds(base), cfg) == kt.Status.success
    assert idx.Add(_sparse_ds(extra), cfg) == kt.Status.success
    r_pending = idx.Search(_sparse_ds(queries), cfg, kt.BitsetView())
    ids_pending = r_pending.value().ids.reshape(4, -1).copy()
    d_pending = r_pending.value().distance.reshape(4, -1).copy()
    # force the merge (Serialize merges), then search again
    bs = kt.BinarySet()
    assert idx.Serialize(bs) == kt.Status.success
    r_merged = idx.Search(_sparse_ds(queries), cfg, kt.BitsetView())
    ids_merged = r_merged.value().ids.reshape(4, -1)
    d_merged = r_merged.value().distance.reshape(4, -1)
    np.testing.assert_allclose(d_pending, d_merged, rtol=1e-5, atol=1e-5)
    assert (ids_pending == ids_merged).mean() > 0.9  # ties may reorder
