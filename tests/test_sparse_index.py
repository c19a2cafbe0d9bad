"""Sparse inverted index family vs sparse brute force oracle
(reference coverage model: tests/ut/test_sparse.cc)."""

import numpy as np
import pytest

import knowhere_tpu as kt
from .utils import gen_sparse_dataset, knn_recall

NB, NQ, DIM, K = 1000, 8, 200, 10


@pytest.fixture(scope="module")
def base():
    return gen_sparse_dataset(NB, DIM, nnz_per_row=16, seed=71)


@pytest.fixture(scope="module")
def queries():
    return gen_sparse_dataset(NQ, DIM, nnz_per_row=16, seed=72)


def build(name, base, tcfg):
    created = kt.IndexFactory.Instance().Create(name, data_type="sparse")
    assert created.has_value(), created.what()
    idx = created.value()
    st = idx.Build(base, tcfg)
    assert st == kt.Status.success, st
    return idx


class TestSparseIndex:
    @pytest.mark.parametrize("name", ["SPARSE_INVERTED_INDEX", "SPARSE_WAND"])
    def test_ip_exact_vs_bruteforce(self, base, queries, name):
        idx = build(name, base, {"metric_type": "IP"})
        res = idx.Search(queries, {"metric_type": "IP", "k": K})
        assert res.has_value(), res.what()
        bf = kt.BruteForce.Search(base, queries, {"metric_type": "IP", "k": K})
        rec = knn_recall(bf.value().ids, res.value().ids, NQ, K)
        assert rec >= 0.95  # exact scoring engine: near-perfect modulo ties

    def test_bm25(self, base, queries):
        idx = build("SPARSE_INVERTED_INDEX", base, {"metric_type": "BM25"})
        cfg = {"metric_type": "BM25", "k": K, "bm25_k1": 1.2, "bm25_b": 0.75, "bm25_avgdl": 8.0}
        res = idx.Search(queries, cfg)
        assert res.has_value(), res.what()
        bf = kt.BruteForce.Search(base, queries, cfg)
        rec = knn_recall(bf.value().ids, res.value().ids, NQ, K)
        assert rec >= 0.95
        # distance values match the oracle
        np.testing.assert_allclose(
            np.sort(res.value().distance.reshape(NQ, K), 1),
            np.sort(bf.value().distance.reshape(NQ, K), 1),
            rtol=1e-3, atol=1e-3,
        )

    def test_bm25_missing_params(self, base, queries):
        idx = build("SPARSE_INVERTED_INDEX", base, {"metric_type": "BM25"})
        res = idx.Search(queries, {"metric_type": "BM25", "k": K})
        assert not res.has_value()
        assert res.error() == kt.Status.invalid_param_in_json

    def test_filtered(self, base, queries):
        idx = build("SPARSE_INVERTED_INDEX", base, {"metric_type": "IP"})
        rng = np.random.default_rng(0)
        filtered = rng.random(NB) < 0.5
        bitset = kt.BitsetView.from_bool_array(filtered)
        res = idx.Search(queries, {"metric_type": "IP", "k": K}, bitset)
        for i in res.value().ids:
            if i >= 0:
                assert not filtered[i]

    def test_drop_ratio_search(self, base, queries):
        idx = build("SPARSE_INVERTED_INDEX", base, {"metric_type": "IP"})
        res = idx.Search(queries, {"metric_type": "IP", "k": K, "drop_ratio_search": 0.3})
        assert res.has_value(), res.what()
        bf = kt.BruteForce.Search(base, queries, {"metric_type": "IP", "k": K})
        assert knn_recall(bf.value().ids, res.value().ids, NQ, K) >= 0.6

    def test_range_search(self, base, queries):
        idx = build("SPARSE_INVERTED_INDEX", base, {"metric_type": "IP"})
        bf = kt.BruteForce.Search(base, queries, {"metric_type": "IP", "k": 30})
        radius = float(np.median(bf.value().distance.reshape(NQ, 30)[:, 15]))
        res = idx.RangeSearch(queries, {"metric_type": "IP", "radius": radius})
        assert res.has_value(), res.what()
        ds = res.value()
        assert ds.lims[-1] > 0
        assert (ds.distance > radius).all()

    def test_iterator(self, base, queries):
        idx = build("SPARSE_INVERTED_INDEX", base, {"metric_type": "IP"})
        res = idx.AnnIterator(queries, {"metric_type": "IP"})
        assert res.has_value(), res.what()
        it = res.value()[0]
        prev = np.inf
        for _ in range(20):
            if not it.HasNext():
                break
            _i, d = it.Next()
            assert d <= prev + 1e-5
            prev = d

    def test_serialize_roundtrip(self, base, queries):
        idx = build("SPARSE_INVERTED_INDEX", base, {"metric_type": "IP"})
        binset = kt.BinarySet()
        assert idx.Serialize(binset) == kt.Status.success
        idx2 = kt.IndexFactory.Instance().Create("SPARSE_INVERTED_INDEX", data_type="sparse").value()
        assert idx2.Deserialize(binset) == kt.Status.success
        r1 = idx.Search(queries, {"metric_type": "IP", "k": K}).value()
        r2 = idx2.Search(queries, {"metric_type": "IP", "k": K}).value()
        np.testing.assert_array_equal(r1.ids, r2.ids)

    def test_get_vector_by_ids(self, base):
        idx = build("SPARSE_INVERTED_INDEX", base, {"metric_type": "IP"})
        assert idx.HasRawData("IP")
        res = idx.GetVectorByIds(kt.GenIdsDataSet(np.array([0, 5])))
        assert res.has_value(), res.what()
        assert res.value().tensor[0] == base.tensor[0]

    def test_cc_growable(self, queries):
        x1 = gen_sparse_dataset(500, DIM, nnz_per_row=16, seed=73)
        x2 = gen_sparse_dataset(300, DIM, nnz_per_row=16, seed=74)
        idx = build("SPARSE_INVERTED_INDEX_CC", x1, {"metric_type": "IP"})
        assert idx.Add(x2, {"metric_type": "IP"}) == kt.Status.success
        assert idx.Count() == 800
        res = idx.Search(queries, {"metric_type": "IP", "k": K})
        assert res.has_value(), res.what()
        assert (res.value().ids >= 0).any()

    def test_drop_ratio_build(self, base, queries):
        idx = build("SPARSE_INVERTED_INDEX", base, {"metric_type": "IP", "drop_ratio_build": 0.2})
        assert not idx.HasRawData("IP")
        res = idx.Search(queries, {"metric_type": "IP", "k": K})
        bf = kt.BruteForce.Search(base, queries, {"metric_type": "IP", "k": K})
        assert knn_recall(bf.value().ids, res.value().ids, NQ, K) >= 0.6

    def test_bad_algo_rejected(self, base):
        idx = kt.IndexFactory.Instance().Create("SPARSE_INVERTED_INDEX", data_type="sparse").value()
        st = idx.Build(base, {"metric_type": "IP", "inverted_index_algo": "NOT_AN_ALGO"})
        assert st == kt.Status.invalid_value_in_json


class TestBM25Oracle:
    def test_hand_computed_scores(self):
        """Pin the BM25 formula against a hand-written oracle (reference
        sparse_utils.h BM25 doc-value computer: score = sum_t q_t *
        tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)), dl = sum of doc tf values)."""
        k1, b, avgdl = 1.5, 0.6, 4.0
        docs = [{0: 2.0, 1: 1.0}, {1: 3.0}, {0: 1.0, 2: 5.0}]
        qs = [{0: 0.7, 1: 0.3}]
        base = kt.GenSparseDataSet(docs, 3)
        q = kt.GenSparseDataSet(qs, 3)
        cfg = {"metric_type": "BM25", "k": 3,
               "bm25_k1": k1, "bm25_b": b, "bm25_avgdl": avgdl}

        def oracle(qd, dd):
            dl = sum(dd.values())
            s = 0.0
            for t, qv in qd.items():
                tf = dd.get(t, 0.0)
                if tf > 0:
                    s += qv * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            return s

        want = sorted(((oracle(qs[0], d), i) for i, d in enumerate(docs)), reverse=True)

        idx = kt.IndexFactory.Instance().Create(
            "SPARSE_INVERTED_INDEX", data_type="sparse_u32_f32"
        ).value()
        assert idx.Build(base, {"metric_type": "BM25", "bm25_k1": k1, "bm25_b": b,
                                "bm25_avgdl": avgdl}) == kt.Status.success
        for api in ("index", "bf"):
            res = (idx.Search(q, cfg) if api == "index"
                   else kt.BruteForce.Search(base, q, cfg))
            assert res.has_value(), res.what()
            got_ids = res.value().ids.reshape(-1)
            got_d = res.value().distance.reshape(-1)
            for rank, (ws, wi) in enumerate(want):
                assert got_ids[rank] == wi, f"{api}: rank {rank} ids {got_ids} want {want}"
                np.testing.assert_allclose(got_d[rank], ws, rtol=1e-5,
                                           err_msg=f"{api} rank {rank}")
