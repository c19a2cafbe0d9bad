"""Feature-dim zero-padding of IVF device stores (models/ivf.py _upload).

Dims not divisible by 128 (GIST's 960, Deep's 96) are zero-padded on device
to unlock the Pallas scan kernels; results must be IDENTICAL to brute force
on the original width for every variant/metric (zero columns are no-ops for
L2/IP/COSINE)."""

import numpy as np
import pytest

import knowhere_tpu as kt

NB, NQ, K = 3000, 16, 8


def _corpus(dim, seed=0):
    # low intrinsic dimensionality (like real embedding data) so quantized
    # variants reach high recall; full-rank gaussian is a known worst case
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((24, dim)).astype(np.float32)
    xb = rng.standard_normal((NB, 24), dtype=np.float32) @ W
    xq = xb[:NQ] + 0.01 * rng.standard_normal((NQ, dim), dtype=np.float32)
    return xb, xq


def _recall(idx_name, dim, build_cfg, search_cfg, metric="L2"):
    xb, xq = _corpus(dim)
    gt = kt.BruteForce.Search(
        kt.GenDataSetFromArray(xb), kt.GenDataSetFromArray(xq),
        {"metric_type": metric, "k": K},
    ).value().ids.reshape(NQ, K)
    idx = kt.IndexFactory.Instance().Create(idx_name).value()
    st = idx.Build(kt.GenDataSetFromArray(xb), {"metric_type": metric, **build_cfg})
    assert st == kt.Status.success, st
    r = idx.Search(
        kt.GenDataSetFromArray(xq), {"metric_type": metric, "k": K, **search_cfg},
        kt.BitsetView(),
    )
    assert r.has_value(), r.what()
    ids = r.value().ids.reshape(NQ, K)
    return np.mean([
        len(set(gt[i].tolist()) & set(ids[i].tolist())) / K for i in range(NQ)
    ]), idx


@pytest.mark.parametrize("dim", [96, 200, 960])
def test_ivf_flat_unaligned_dim(dim):
    rec, idx = _recall("IVF_FLAT", dim, {"nlist": 16}, {"nprobe": 16})
    assert rec >= 0.99, rec
    assert idx.node._d_dev % 128 == 0 and idx.node._d_dev >= dim


@pytest.mark.parametrize("dim", [200, 960])
def test_ivf_pq_unaligned_dim(dim):
    m = {200: 20, 960: 32}[dim]
    rec, _ = _recall(
        "IVF_PQ", dim,
        {"nlist": 8, "m": m, "nbits": 8, "refine": True, "refine_type": "FP32"},
        {"nprobe": 8, "refine_k": 8},
    )
    assert rec >= 0.95, rec


def test_ivf_sq_unaligned_dim():
    rec, _ = _recall("IVF_SQ8", 200, {"nlist": 8}, {"nprobe": 8})
    assert rec >= 0.9, rec


def test_ivf_rabitq_unaligned_dim():
    rec, _ = _recall(
        "IVF_RABITQ", 200, {"nlist": 8, "refine": True, "refine_type": "FP32"},
        {"nprobe": 8, "refine_k": 8},
    )
    assert rec >= 0.9, rec


def test_ivf_cosine_unaligned_dim():
    rec, _ = _recall("IVF_FLAT", 200, {"nlist": 8}, {"nprobe": 8}, metric="COSINE")
    assert rec >= 0.99, rec


def test_unaligned_dim_bitset_and_roundtrip():
    dim = 200
    xb, xq = _corpus(dim)
    idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
    assert idx.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2", "nlist": 8}) == kt.Status.success
    # filter out the true NN (row i for query i)
    bits = np.zeros(NB, dtype=bool)
    bits[:NQ] = True
    bs = kt.BitsetView(np.packbits(bits, bitorder="little"), NB)
    r = idx.Search(kt.GenDataSetFromArray(xq), {"metric_type": "L2", "k": K, "nprobe": 8}, bs)
    ids = r.value().ids.reshape(NQ, K)
    assert not np.isin(ids[ids >= 0], np.arange(NQ)).any()
    # serialize -> fresh -> identical
    binset = kt.BinarySet()
    idx.Serialize(binset)
    idx2 = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
    assert idx2.Deserialize(binset) == kt.Status.success
    r0 = idx.Search(kt.GenDataSetFromArray(xq), {"metric_type": "L2", "k": K, "nprobe": 8}, kt.BitsetView())
    r1 = idx2.Search(kt.GenDataSetFromArray(xq), {"metric_type": "L2", "k": K, "nprobe": 8}, kt.BitsetView())
    np.testing.assert_array_equal(r0.value().ids, r1.value().ids)
