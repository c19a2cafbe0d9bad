"""END-TO-END Pallas dispatch in interpret mode (KNOWHERE_PALLAS_INTERPRET=1).

The per-kernel oracle tests (test_adc_pallas / test_int8_scan / test_pallas)
cover kernel math, but the production dispatch — aligned store layouts, task
building/packing, per-dispatcher pre-processing, cross-block merge, exact
re-rank — only ran on real TPU until this tier. Here the PUBLIC Index API is
driven with the Pallas paths forced through interpret-mode kernels on the CPU
backend, asserting (a) the Pallas dispatcher actually served the query and
(b) recall vs exact brute force (reference floor analog:
tests/ut/test_search.cc kKnnRecallThreshold).
"""

import os

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.dataset import GenDataSetFromArray as DS
from knowhere_tpu.ops.distances import DistancePrecision, set_distance_precision

NB, NQ, DIM, K = 8192, 16, 128, 10


@pytest.fixture(scope="module", autouse=True)
def _force_interpret():
    os.environ["KNOWHERE_PALLAS_INTERPRET"] = "1"
    os.environ["KNOWHERE_IVF_ALIGN_MIN"] = "4096"  # aligned lists at test scale
    set_distance_precision(DistancePrecision.FAST)
    yield
    os.environ.pop("KNOWHERE_PALLAS_INTERPRET", None)
    os.environ.pop("KNOWHERE_IVF_ALIGN_MIN", None)
    set_distance_precision(DistancePrecision.EXACT)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    nc, intr = 64, 32
    centers = rng.standard_normal((nc, DIM)).astype(np.float32)
    W = rng.standard_normal((intr, DIM)).astype(np.float32) * np.sqrt(DIM / intr) / np.sqrt(intr)
    xb = centers[rng.integers(0, nc, NB)] + rng.standard_normal((NB, intr)).astype(np.float32) @ W
    xq = centers[rng.integers(0, nc, NQ)] + rng.standard_normal((NQ, intr)).astype(np.float32) @ W
    d2 = (xq**2).sum(1)[:, None] - 2.0 * xq @ xb.T + (xb**2).sum(1)[None, :]
    gt = np.argsort(d2, 1)[:, :K]
    return xb, xq, gt


def _recall(ids, gt):
    return np.mean([len(set(ids[i]) & set(gt[i])) / K for i in range(NQ)])


def _count_dispatch(monkeypatch, names):
    """Wrap ivf_scan dispatchers with call counters."""
    from knowhere_tpu.ops import ivf_scan

    hits = {n: 0 for n in names}
    for n in names:
        orig = getattr(ivf_scan, n)

        def wrap(*a, __o=orig, __n=n, **kw):
            hits[__n] += 1
            return __o(*a, **kw)

        monkeypatch.setattr(ivf_scan, n, wrap)
    return hits


CASES = [
    # (name, build cfg, search cfg, dispatcher that must serve, floor)
    ("IVF_FLAT", {"nlist": 16}, {"nprobe": 12}, "_pallas_int8_search", 0.9),
    ("IVF_SQ8", {"nlist": 16, "sq_type": "SQ8"}, {"nprobe": 12},
     "_pallas_int8_search", 0.9),
    ("IVF_PQ", {"nlist": 16, "m": 16, "nbits": 8, "refine": True,
                "refine_type": "FP16"}, {"nprobe": 8, "refine_k": 8},
     "_pallas_adc_search", 0.8),
    ("SCANN", {"nlist": 16, "sub_dim": 2, "with_raw_data": True},
     {"nprobe": 8, "reorder_k": 128}, "_pallas_adc_search", 0.8),
]


@pytest.mark.parametrize("name,bcfg,scfg,dispatcher,floor", CASES)
def test_interpret_e2e_family(name, bcfg, scfg, dispatcher, floor,
                              corpus, monkeypatch):
    xb, xq, gt = corpus
    hits = _count_dispatch(monkeypatch, [dispatcher])
    idx = kt.IndexFactory.Instance().Create(name).value()
    cfg = {"metric_type": "L2", **bcfg}
    assert idx.Build(DS(xb), cfg) == kt.Status.success
    r = idx.Search(DS(xq), {"metric_type": "L2", "k": K, **scfg}, kt.BitsetView())
    assert r.has_value(), r.what()
    ids = r.value().ids.reshape(NQ, K)
    assert hits[dispatcher] > 0, f"{name} did not take the Pallas {dispatcher} path"
    assert _recall(ids, gt) >= floor

    # bitset-filtered variant through the same kernel path (keep 50%)
    rng = np.random.default_rng(1)
    drop = rng.random(NB) < 0.5
    bs = kt.BitsetView.from_bool_array(drop)
    r = idx.Search(DS(xq), {"metric_type": "L2", "k": K, **scfg}, bs)
    assert r.has_value(), r.what()
    ids = r.value().ids.reshape(NQ, K)
    valid = ids[ids >= 0]
    assert valid.size > 0 and not drop[valid].any()
