"""IVF family: recall vs brute force (floor 0.6, reference
tests/ut/test_search.cc:13), filtering, range search, iterator, serialize,
CC concurrent add+search (reference test_ivfflat_cc.cc)."""

import threading

import numpy as np
import pytest

import knowhere_tpu as kt
from .utils import (
    KNN_RECALL_THRESHOLD,
    brute_force_gt,
    gen_binary_dataset,
    gen_bitset,
    gen_dataset,
    knn_recall,
)

NB, NQ, DIM, K = 2000, 10, 64, 10


@pytest.fixture(scope="module")
def base():
    return gen_dataset(NB, DIM, seed=41)


@pytest.fixture(scope="module")
def queries():
    return gen_dataset(NQ, DIM, seed=42)


def build(name, base, train_cfg, data_type="fp32"):
    created = kt.IndexFactory.Instance().Create(name, data_type=data_type)
    assert created.has_value(), created.what()
    idx = created.value()
    st = idx.Build(base, train_cfg)
    assert st == kt.Status.success, st
    return idx


INDEX_CONFIGS = [
    ("IVF_FLAT", {"nlist": 32}, {"nprobe": 12}),
    ("IVF_SQ8", {"nlist": 32, "sq_type": "SQ8"}, {"nprobe": 12}),
    ("IVF_SQ8", {"nlist": 32, "sq_type": "SQ4"}, {"nprobe": 12}),
    ("IVF_SQ8", {"nlist": 32, "sq_type": "FP16"}, {"nprobe": 12}),
    ("IVF_PQ", {"nlist": 32, "m": 16, "nbits": 8}, {"nprobe": 16}),
    ("IVF_PQ", {"nlist": 32, "m": 8, "nbits": 8, "refine": True, "refine_type": "FP16"}, {"nprobe": 12, "refine_k": 4}),
    ("SCANN", {"nlist": 32, "sub_dim": 2, "with_raw_data": True}, {"nprobe": 12, "reorder_k": 60}),
    ("IVF_RABITQ", {"nlist": 32, "refine": True}, {"nprobe": 16, "refine_k": 8}),
]


class TestIvfSearch:
    @pytest.mark.parametrize("name,tcfg,scfg", INDEX_CONFIGS)
    @pytest.mark.parametrize("metric", ["L2", "IP"])
    def test_recall(self, base, queries, name, tcfg, scfg, metric):
        idx = build(name, base, {"metric_type": metric, **tcfg})
        res = idx.Search(queries, {"metric_type": metric, "k": K, **scfg})
        assert res.has_value(), res.what()
        gt_ids, _ = brute_force_gt(base, queries, metric, K)
        rec = knn_recall(gt_ids, res.value().ids, NQ, K)
        assert rec >= KNN_RECALL_THRESHOLD, f"{name} {metric} recall {rec}"

    def test_cosine(self, base, queries):
        idx = build("IVF_FLAT", base, {"metric_type": "COSINE", "nlist": 32})
        res = idx.Search(queries, {"metric_type": "COSINE", "k": K, "nprobe": 12})
        assert res.has_value(), res.what()
        gt_ids, gt_d = brute_force_gt(base, queries, "COSINE", K)
        assert knn_recall(gt_ids, res.value().ids, NQ, K) >= KNN_RECALL_THRESHOLD
        # cosine similarities within [-1, 1]
        d = res.value().distance
        assert (d <= 1.0 + 1e-4).all() and (d >= -1.0 - 1e-4).all()

    def test_full_nprobe_equals_bruteforce(self, base, queries):
        idx = build("IVF_FLAT", base, {"metric_type": "L2", "nlist": 16})
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "nprobe": 16})
        gt_ids, gt_dists = brute_force_gt(base, queries, "L2", K)
        assert knn_recall(gt_ids, res.value().ids, NQ, K) >= 0.99
        np.testing.assert_allclose(
            np.sort(res.value().distance.reshape(NQ, K), 1), np.sort(gt_dists, 1), rtol=2e-3, atol=2e-3
        )

    def test_filtered(self, base, queries):
        idx = build("IVF_FLAT", base, {"metric_type": "L2", "nlist": 32})
        bitset = gen_bitset(NB, 0.5)
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "nprobe": 8}, bitset)
        assert res.has_value(), res.what()
        for i in res.value().ids:
            if i >= 0:
                assert not bitset.test(int(i))

    def test_ensure_topk_full_under_heavy_filter(self, base, queries):
        idx = build("IVF_FLAT", base, {"metric_type": "L2", "nlist": 32})
        filtered = np.ones(NB, bool)
        filtered[:50] = False  # 50 rows survive, scattered over lists
        bitset = kt.BitsetView.from_bool_array(filtered)
        res = idx.Search(
            queries, {"metric_type": "L2", "k": K, "nprobe": 1, "ensure_topk_full": True}, bitset
        )
        ids = res.value().ids.reshape(NQ, K)
        # with expansion, every query must fill all k slots from the 50 survivors
        assert (ids >= 0).all()

    def test_metric_mismatch(self, base, queries):
        idx = build("IVF_FLAT", base, {"metric_type": "L2", "nlist": 32})
        res = idx.Search(queries, {"metric_type": "IP", "k": K})
        assert not res.has_value()
        assert res.error() == kt.Status.invalid_metric_type

    def test_nlist_autoshrink(self, queries):
        small = gen_dataset(100, DIM, seed=43)
        idx = build("IVF_FLAT", small, {"metric_type": "L2", "nlist": 1024})
        res = idx.Search(queries, {"metric_type": "L2", "k": 5, "nprobe": 2})
        assert res.has_value(), res.what()

    def test_int8(self, queries):
        rng = np.random.default_rng(44)
        xb = rng.integers(-100, 100, size=(NB, DIM)).astype(np.int8)
        xq = rng.integers(-100, 100, size=(NQ, DIM)).astype(np.int8)
        base8 = kt.GenDataSetFromArray(xb)
        q8 = kt.GenDataSetFromArray(xq)
        idx = build("IVF_FLAT", base8, {"metric_type": "L2", "nlist": 16}, data_type="int8")
        res = idx.Search(q8, {"metric_type": "L2", "k": K, "nprobe": 16})
        d = ((xq.astype(np.float64)[:, None] - xb.astype(np.float64)[None]) ** 2).sum(-1)
        gt = np.argsort(d, 1, kind="stable")[:, :K]
        assert knn_recall(gt, res.value().ids, NQ, K) >= 0.95


class TestIvfRangeSearch:
    def test_l2(self, base, queries):
        idx = build("IVF_FLAT", base, {"metric_type": "L2", "nlist": 32})
        _, gt_d = brute_force_gt(base, queries, "L2", 60)
        radius = float(np.median(gt_d[:, 30]))
        res = idx.RangeSearch(queries, {"metric_type": "L2", "radius": radius, "nprobe": 32})
        assert res.has_value(), res.what()
        ds = res.value()
        assert ds.lims[-1] > 0
        assert (ds.distance < radius + 1e-3).all()

        # recall vs brute force range search
        bf = kt.BruteForce.RangeSearch(base, queries, {"metric_type": "L2", "radius": radius})
        from .utils import range_search_recall

        assert range_search_recall(bf.value(), ds, NQ) >= KNN_RECALL_THRESHOLD


class TestIvfIterator:
    def test_sorted_stream(self, base, queries):
        idx = build("IVF_FLAT", base, {"metric_type": "L2", "nlist": 32})
        res = idx.AnnIterator(queries, {"metric_type": "L2", "nprobe": 16})
        assert res.has_value(), res.what()
        it = res.value()[0]
        prev = -np.inf
        seen = set()
        for _ in range(300):
            assert it.HasNext()
            i, d = it.Next()
            assert d >= prev - 1e-5
            prev = d
            assert i not in seen
            seen.add(i)


class TestIvfSerialize:
    @pytest.mark.parametrize(
        "name,tcfg",
        [
            ("IVF_FLAT", {"nlist": 16}),
            ("IVF_PQ", {"nlist": 16, "m": 8}),
            ("IVF_SQ8", {"nlist": 16}),
            ("IVF_RABITQ", {"nlist": 16, "refine": True}),
        ],
    )
    def test_roundtrip(self, base, queries, name, tcfg):
        idx = build(name, base, {"metric_type": "L2", **tcfg})
        binset = kt.BinarySet()
        assert idx.Serialize(binset) == kt.Status.success
        idx2 = kt.IndexFactory.Instance().Create(name).value()
        assert idx2.Deserialize(binset) == kt.Status.success
        assert idx2.Count() == NB
        r1 = idx.Search(queries, {"metric_type": "L2", "k": K, "nprobe": 8}).value()
        r2 = idx2.Search(queries, {"metric_type": "L2", "k": K, "nprobe": 8}).value()
        np.testing.assert_array_equal(r1.ids, r2.ids)

    def test_get_vector_by_ids(self, base):
        idx = build("IVF_FLAT", base, {"metric_type": "L2", "nlist": 16})
        assert idx.HasRawData("L2")
        ids = np.array([5, 100, 1999])
        res = idx.GetVectorByIds(kt.GenIdsDataSet(ids))
        assert res.has_value(), res.what()
        np.testing.assert_allclose(res.value().tensor, np.asarray(base.tensor)[ids], rtol=1e-6)

    def test_cosine_get_vector_restores_raw(self, base):
        idx = build("IVF_FLAT", base, {"metric_type": "COSINE", "nlist": 16})
        ids = np.array([0, 7])
        res = idx.GetVectorByIds(kt.GenIdsDataSet(ids))
        np.testing.assert_allclose(res.value().tensor, np.asarray(base.tensor)[ids], rtol=1e-4, atol=1e-5)

    def test_pq_has_no_raw_data(self, base):
        idx = build("IVF_PQ", base, {"metric_type": "L2", "nlist": 16, "m": 8})
        assert not idx.HasRawData("L2")


class TestBinIvf:
    def test_hamming(self):
        nb, nbits = 1500, 128
        base = gen_binary_dataset(nb, nbits, seed=45)
        queries = gen_binary_dataset(5, nbits, seed=46)
        idx = build("BIN_IVF_FLAT", base, {"metric_type": "HAMMING", "nlist": 8}, data_type="bin1")
        res = idx.Search(queries, {"metric_type": "HAMMING", "k": 5, "nprobe": 4})
        assert res.has_value(), res.what()
        xb = np.unpackbits(np.asarray(base.tensor), axis=1, bitorder="little")
        xq = np.unpackbits(np.asarray(queries.tensor), axis=1, bitorder="little")
        gt = np.argsort((xq[:, None] != xb[None]).sum(-1), 1, kind="stable")[:, :5]
        assert knn_recall(gt, res.value().ids, 5, 5) >= KNN_RECALL_THRESHOLD
        # distances are integral hamming values
        d = res.value().distance
        np.testing.assert_allclose(d, np.round(d), atol=1e-3)

    def test_jaccard(self):
        base = gen_binary_dataset(1000, 128, seed=47)
        queries = gen_binary_dataset(5, 128, seed=48)
        idx = build("BIN_IVF_FLAT", base, {"metric_type": "JACCARD", "nlist": 8}, data_type="bin1")
        res = idx.Search(queries, {"metric_type": "JACCARD", "k": 5, "nprobe": 8})
        assert res.has_value(), res.what()
        d = res.value().distance
        assert ((d >= 0) & (d <= 1)).all()


class TestIvfCC:
    def test_add_after_build(self, queries):
        x1 = gen_dataset(1000, DIM, seed=49)
        x2 = gen_dataset(500, DIM, seed=50)
        idx = build("IVF_FLAT_CC", x1, {"metric_type": "L2", "nlist": 16})
        assert idx.Add(x2, {"metric_type": "L2"}) == kt.Status.success
        assert idx.Count() == 1500
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "nprobe": 16})
        assert res.has_value(), res.what()
        # ids from the appended segment must be reachable
        xall = np.concatenate([np.asarray(x1.tensor), np.asarray(x2.tensor)])
        gt = np.argsort(((np.asarray(queries.tensor)[:, None] - xall[None]) ** 2).sum(-1), 1)[:, :K]
        assert knn_recall(gt, res.value().ids, NQ, K) >= KNN_RECALL_THRESHOLD

    def test_concurrent_add_search(self):
        x1 = gen_dataset(1000, DIM, seed=51)
        qs = gen_dataset(4, DIM, seed=52)
        idx = build("IVF_FLAT_CC", x1, {"metric_type": "L2", "nlist": 16})
        errors = []

        def adder():
            for s in range(5):
                st = idx.Add(gen_dataset(200, DIM, seed=100 + s), {"metric_type": "L2"})
                if st != kt.Status.success:
                    errors.append(st)

        def searcher():
            for _ in range(10):
                r = idx.Search(qs, {"metric_type": "L2", "k": 5, "nprobe": 8})
                if not r.has_value():
                    errors.append(r.error())

        threads = [threading.Thread(target=adder)] + [threading.Thread(target=searcher) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert idx.Count() == 2000

    def test_plain_ivf_accepts_add_after_build(self, base):
        # reference plain IVF accepts repeated Add (ivf.cc:806-842)
        idx = build("IVF_FLAT", base, {"metric_type": "L2", "nlist": 16})
        extra = gen_dataset(10, DIM, seed=53)
        st = idx.Add(extra, {"metric_type": "L2"})
        assert st == kt.Status.success
        assert idx.Count() == NB + 10
        # the appended rows are immediately searchable: query the new rows
        r = idx.Search(extra, {"metric_type": "L2", "k": 1, "nprobe": 16})
        assert r.has_value()
        ids = r.value().ids.reshape(10)
        assert (ids >= NB).mean() >= 0.9  # each new row finds itself


class TestAlignedLayout:
    """Block-aligned list storage (lists padded to LIST_ALIGN multiples —
    the Pallas scan's layout) must be behavior-identical to the compact
    layout on the XLA path: search, filters, serialize, GetVectorByIds."""

    @pytest.fixture()
    def aligned_idx(self, monkeypatch):
        monkeypatch.setenv("KNOWHERE_IVF_ALIGN_MIN", "100")
        base = gen_dataset(NB, DIM, seed=81)
        idx = build("IVF_FLAT", base, {"metric_type": "L2", "nlist": 16})
        return idx, base

    def test_padded_storage_shape(self, aligned_idx):
        idx, _ = aligned_idx
        node = idx
        while not hasattr(node, "_offsets"):
            node = node._node
        assert (np.asarray(node._offsets) % 512 == 0).all()
        assert node.Count() == NB
        assert int(node._lengths.sum()) == NB

    def test_search_matches_gt(self, aligned_idx):
        idx, base = aligned_idx
        queries = gen_dataset(NQ, DIM, seed=82)
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "nprobe": 16})
        assert res.has_value(), res.what()
        gt, _ = brute_force_gt(base, queries, "L2", K)
        assert knn_recall(gt, res.value().ids, NQ, K) >= 0.99

    def test_filtered_search(self, aligned_idx):
        idx, base = aligned_idx
        queries = gen_dataset(NQ, DIM, seed=83)
        bs = gen_bitset(NB, 0.5, seed=84)
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "nprobe": 16}, bs)
        assert res.has_value(), res.what()
        gt, _ = brute_force_gt(base, queries, "L2", K, bs)
        assert knn_recall(gt, res.value().ids, NQ, K) >= 0.95

    def test_serialize_roundtrip(self, aligned_idx):
        idx, _ = aligned_idx
        queries = gen_dataset(NQ, DIM, seed=85)
        r1 = idx.Search(queries, {"metric_type": "L2", "k": K, "nprobe": 8})
        bs = kt.BinarySet()
        assert idx.Serialize(bs) == kt.Status.success
        idx2 = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
        assert idx2.Deserialize(bs) == kt.Status.success
        assert idx2.Count() == NB
        r2 = idx2.Search(queries, {"metric_type": "L2", "k": K, "nprobe": 8})
        assert np.array_equal(r1.value().ids, r2.value().ids)

    def test_get_vector_by_ids(self, aligned_idx):
        idx, base = aligned_idx
        ids = np.array([0, 7, NB - 1], dtype=np.int64)
        got = idx.GetVectorByIds(kt.GenIdsDataSet(ids))
        assert got.has_value(), got.what()
        np.testing.assert_allclose(
            np.asarray(got.value().tensor), np.asarray(base.tensor)[ids], rtol=1e-6
        )
