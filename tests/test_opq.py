"""OPQ rotation for IVF_PQ (ops/quant.opq_train).

Parity target: faiss OPQMatrix::train (thirdparty/faiss) — the reference
reaches OPQ via index-factory strings; the TPU rebuild makes it the IVF_PQ
default (models/ivf.py IvfPqConfig.opq) because ADC candidate quality sets
nprobe@recall, the QPS-dominant knob."""

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.ops import quant as Q


def _correlated(n, d, seed=0, intrinsic=16):
    """Low-rank-ish data where subspace energy is unbalanced: the regime OPQ
    exists for (plain PQ wastes codebook entropy on high-variance subs)."""
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((intrinsic, d)).astype(np.float32)
    W *= np.linspace(3.0, 0.1, intrinsic)[:, None].astype(np.float32)
    return rng.standard_normal((n, intrinsic)).astype(np.float32) @ W


def _recon_err(x, codec, R=None):
    xr = x @ R.T if R is not None else x
    codes = Q.pq_encode(codec, xr)
    flat = codec.codebooks.reshape(-1, codec.sub_dim)
    off = (np.arange(codec.m) * codec.ksub)[None, :]
    dec = flat[codes.astype(np.int64) + off].reshape(x.shape[0], x.shape[1])
    if R is not None:
        dec = dec @ R  # back to the original frame
    return float(np.mean(np.sum((x - dec) ** 2, axis=1)))


def test_opq_reduces_reconstruction_error():
    x = _correlated(20000, 64)
    plain = Q.pq_train(x, m=8, nbits=6)
    R, rot = Q.opq_train(x, m=8, nbits=6, n_iter=4, sample=8192)
    # R orthogonal
    np.testing.assert_allclose(R @ R.T, np.eye(64), atol=1e-4)
    e_plain = _recon_err(x, plain)
    e_opq = _recon_err(x, rot, R)
    assert e_opq < 0.9 * e_plain, (e_plain, e_opq)


def test_ivf_pq_opq_roundtrip_and_search():
    rng = np.random.default_rng(3)
    nb, d = 4000, 32
    xb = (_correlated(nb, d, seed=3) + rng.standard_normal((nb, d)).astype(np.float32) * 0.05)
    cfg = {"metric_type": "L2", "nlist": 4, "m": 4, "nbits": 6,
           "refine": True, "refine_type": "FP16"}
    idx = kt.IndexFactory.Instance().Create("IVF_PQ").value()
    assert idx.Train(kt.GenDataSetFromArray(xb), cfg).name == "success"
    assert idx.Add(kt.GenDataSetFromArray(xb), cfg).name == "success"
    assert idx.node._opq_rot is not None
    q = kt.GenDataSetFromArray(xb[:16])
    r = idx.Search(q, {"metric_type": "L2", "k": 5, "nprobe": 4, "refine_k": 8})
    assert r.has_value(), r.what()
    ids = np.asarray(r.value().ids).reshape(16, 5)
    assert (ids[:, 0] == np.arange(16)).mean() >= 0.9  # self-match via refine

    bs = kt.BinarySet()
    assert idx.Serialize(bs).name == "success"
    idx2 = kt.IndexFactory.Instance().Create("IVF_PQ").value()
    assert idx2.Deserialize(bs, cfg).name == "success"
    assert idx2.node._opq_rot is not None
    r2 = idx2.Search(q, {"metric_type": "L2", "k": 5, "nprobe": 4, "refine_k": 8})
    np.testing.assert_array_equal(
        np.asarray(r.value().ids), np.asarray(r2.value().ids)
    )


def test_ivf_pq_opq_off_knob():
    xb = _correlated(3000, 32, seed=5)
    cfg = {"metric_type": "L2", "nlist": 4, "m": 4, "nbits": 4, "opq": False}
    idx = kt.IndexFactory.Instance().Create("IVF_PQ").value()
    assert idx.Train(kt.GenDataSetFromArray(xb), cfg).name == "success"
    assert idx.node._opq_rot is None
