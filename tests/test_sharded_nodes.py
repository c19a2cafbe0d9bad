"""SHARDED_* index nodes on the public factory surface (SURVEY.md §5.8).

Runs on the virtual 8-device CPU mesh (conftest). Checks the full reference
Index contract on the sharded variants: factory Create, Build, Search (with
recall floor vs BruteForce), bitset filtering, Serialize/Deserialize
round-trip, GetVectorByIds.
"""

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.brute_force import BruteForce
from knowhere_tpu.dataset import GenDataSetFromArray as DS

NB, NQ, DIM, K = 4000, 24, 64, 10

CASES = [
    ("SHARDED_FLAT", {"metric_type": "L2", "k": K}, 0.99),
    ("SHARDED_IVF_FLAT", {"metric_type": "L2", "k": K, "nlist": 32, "nprobe": 32}, 0.99),
    ("SHARDED_IVF_SQ8", {"metric_type": "L2", "k": K, "nlist": 32, "nprobe": 32}, 0.9),
    ("SHARDED_IVF_PQ", {"metric_type": "L2", "k": K, "nlist": 32, "nprobe": 32, "m": 16}, 0.3),
    ("SHARDED_HNSW", {"metric_type": "L2", "k": K, "M": 16, "efConstruction": 64, "ef": 96}, 0.6),
]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    xb = rng.standard_normal((NB, DIM), dtype=np.float32)
    xq = rng.standard_normal((NQ, DIM), dtype=np.float32)
    gt = BruteForce.Search(DS(xb), DS(xq), {"metric_type": "L2", "k": K}, kt.BitsetView())
    return xb, xq, gt.value().ids.reshape(NQ, K)


def _recall(ids, gtids):
    return np.mean([len(set(ids[i]) & set(gtids[i])) / K for i in range(NQ)])


@pytest.mark.parametrize("name,cfg,floor", CASES)
def test_sharded_build_search_recall(name, cfg, floor, data):
    xb, xq, gtids = data
    e = kt.IndexFactory.Instance().Create(name)
    assert e.has_value(), e.what()
    idx = e.value()
    assert idx.Build(DS(xb), cfg) == kt.Status.success
    assert idx.Count() == NB
    assert idx.Dim() == DIM
    r = idx.Search(DS(xq), cfg, kt.BitsetView())
    assert r.has_value(), r.what()
    ids = r.value().ids.reshape(NQ, K)
    assert _recall(ids, gtids) >= floor


@pytest.mark.parametrize("name,cfg,floor", CASES)
def test_sharded_bitset_filtering(name, cfg, floor, data):
    xb, xq, _ = data
    idx = kt.IndexFactory.Instance().Create(name).value()
    assert idx.Build(DS(xb), cfg) == kt.Status.success
    # filter out 30% of rows
    rng = np.random.default_rng(13)
    filtered = np.zeros(NB, dtype=bool)
    filtered[rng.choice(NB, size=int(NB * 0.3), replace=False)] = True
    bitset = kt.BitsetView.from_bool_array(filtered)
    r = idx.Search(DS(xq), cfg, bitset)
    assert r.has_value(), r.what()
    ids = r.value().ids.reshape(NQ, K)
    valid = ids[ids >= 0]
    assert valid.size > 0
    assert not filtered[valid].any(), "returned a filtered-out row"


@pytest.mark.parametrize(
    "name,cfg,floor", [c for c in CASES if c[0] != "SHARDED_FLAT"]
)
def test_sharded_serialize_roundtrip(name, cfg, floor, data):
    xb, xq, gtids = data
    idx = kt.IndexFactory.Instance().Create(name).value()
    assert idx.Build(DS(xb), cfg) == kt.Status.success
    r0 = idx.Search(DS(xq), cfg, kt.BitsetView())
    ids0 = r0.value().ids.reshape(NQ, K)

    binset = kt.BinarySet()
    assert idx.Serialize(binset) == kt.Status.success
    idx2 = kt.IndexFactory.Instance().Create(name).value()
    assert idx2.Deserialize(binset, cfg) == kt.Status.success
    assert idx2.Count() == NB
    r1 = idx2.Search(DS(xq), cfg, kt.BitsetView())
    assert r1.has_value(), r1.what()
    ids1 = r1.value().ids.reshape(NQ, K)
    # deserialization restores the logical index: identical results
    # (re-distribution may reorder exact ties, so allow a tiny slack)
    agree = (ids0 == ids1).mean()
    assert agree > 0.95, f"round-trip changed results: agree={agree}"


def test_sharded_flat_serialize_roundtrip(data):
    xb, xq, gtids = data
    cfg = {"metric_type": "L2", "k": K}
    idx = kt.IndexFactory.Instance().Create("SHARDED_FLAT").value()
    assert idx.Build(DS(xb), cfg) == kt.Status.success
    binset = kt.BinarySet()
    assert idx.Serialize(binset) == kt.Status.success
    idx2 = kt.IndexFactory.Instance().Create("SHARDED_FLAT").value()
    assert idx2.Deserialize(binset, cfg) == kt.Status.success
    r = idx2.Search(DS(xq), cfg, kt.BitsetView())
    ids = r.value().ids.reshape(NQ, K)
    assert _recall(ids, gtids) == 1.0


def test_sharded_get_vector_by_ids(data):
    xb, _, _ = data
    cfg = {"metric_type": "L2", "k": K}
    for name in ("SHARDED_FLAT", "SHARDED_IVF_FLAT", "SHARDED_HNSW"):
        c = dict(cfg)
        if name == "SHARDED_IVF_FLAT":
            c.update(nlist=16, nprobe=16)
        if name == "SHARDED_HNSW":
            c.update(M=8, efConstruction=32)
        idx = kt.IndexFactory.Instance().Create(name).value()
        assert idx.Build(DS(xb), c) == kt.Status.success
        want = np.asarray([0, 17, NB - 1], dtype=np.int64)
        ds = kt.DataSet()
        ds.set("ids", want)
        ds.rows = len(want)
        r = idx.GetVectorByIds(ds)
        assert r.has_value(), (name, r.what())
        got = np.asarray(r.value().tensor).reshape(len(want), DIM)
        np.testing.assert_allclose(got, xb[want], rtol=1e-6)


def test_sharded_cosine(data):
    xb, xq, _ = data
    cfg = {"metric_type": "COSINE", "k": K, "nlist": 32, "nprobe": 32}
    gt = BruteForce.Search(DS(xb), DS(xq), {"metric_type": "COSINE", "k": K}, kt.BitsetView())
    gtids = gt.value().ids.reshape(NQ, K)
    for name in ("SHARDED_FLAT", "SHARDED_IVF_FLAT"):
        idx = kt.IndexFactory.Instance().Create(name).value()
        assert idx.Build(DS(xb), cfg) == kt.Status.success
        r = idx.Search(DS(xq), cfg, kt.BitsetView())
        assert r.has_value(), r.what()
        ids = r.value().ids.reshape(NQ, K)
        assert _recall(ids, gtids) >= 0.95
        # cosine returns similarities (larger = closer), in [-1, 1]
        d = r.value().distance.reshape(NQ, K)
        assert (d[:, 0] + 1e-5 >= d[:, -1]).all()
        assert d.max() <= 1.0 + 1e-4


def test_sharded_ivfpq_refine_recall_at_scale():
    """>=100k-row sharded IVF_PQ + refine recall-vs-GT tier (VERDICT r4 #6).

    The Deep10M sharded-refine bug class (commit e64e10a: the sharded engine
    silently ignored `refine`, recall 0.59 at the bench) shipped through
    three green dryruns because the dryrun corpus was 512 rows/device. This
    tier is sized so PQ-only candidates CANNOT pass: calibrated on this
    exact corpus, refine-honored recall = 0.93, refine-ignored = 0.50 — the
    0.85 floor is red on the regression with margin on both sides."""
    nb, nq, dim, k = 100_000, 64, 48, 10
    rng = np.random.default_rng(5)
    nc, intr = 100, 16
    centers = rng.standard_normal((nc, dim)).astype(np.float32)
    centers *= rng.uniform(0.9, 1.6, size=(nc, 1)).astype(np.float32)
    W = rng.standard_normal((intr, dim)).astype(np.float32)
    W *= np.sqrt(dim / intr) / np.sqrt(intr)
    xb = centers[rng.integers(0, nc, nb)] + (
        rng.standard_normal((nb, intr)).astype(np.float32) @ W
    )
    xq = centers[rng.integers(0, nc, nq)] + (
        rng.standard_normal((nq, intr)).astype(np.float32) @ W
    )
    # exact GT on the 64-query sample (sampled GT is this tier's contract)
    d2 = (xq**2).sum(1)[:, None] - 2.0 * xq @ xb.T + (xb**2).sum(1)[None, :]
    gt = np.argsort(d2, 1)[:, :k]

    cfg = {"metric_type": "L2", "k": k, "nlist": 128, "nprobe": 16,
           "m": 6, "nbits": 8, "refine": True, "refine_type": "FP16",
           "refine_k": 8}
    idx = kt.IndexFactory.Instance().Create("SHARDED_IVF_PQ").value()
    assert idx.Build(DS(xb), cfg) == kt.Status.success
    r = idx.Search(DS(xq), cfg, kt.BitsetView())
    assert r.has_value(), r.what()
    ids = r.value().ids.reshape(nq, k)
    rec = np.mean([len(set(ids[i]) & set(gt[i])) / k for i in range(nq)])
    assert rec >= 0.85, f"sharded refine recall regressed: {rec:.4f}"


def test_sharded_rejects_unknown_metric():
    idx = kt.IndexFactory.Instance().Create("SHARDED_IVF_FLAT").value()
    rng = np.random.default_rng(0)
    xb = rng.standard_normal((256, 16), dtype=np.float32)
    st = idx.Build(DS(xb), {"metric_type": "HAMMING", "k": 4})
    assert st != kt.Status.success
