"""BruteForce exact search vs an independent numpy oracle
(reference coverage model: tests/ut/test_search.cc brute-force paths +
test_simd.cc kernel-vs-reference checks; floor 0.95, test_search.cc:14)."""

import numpy as np
import pytest

import knowhere_tpu as kt
from .utils import (
    BRUTE_FORCE_RECALL_THRESHOLD,
    brute_force_gt,
    gen_bitset,
    gen_binary_dataset,
    gen_dataset,
    gen_sparse_dataset,
    knn_recall,
)

NB, NQ, DIM, K = 1000, 10, 128, 10


@pytest.fixture(scope="module")
def base():
    return gen_dataset(NB, DIM, seed=1)


@pytest.fixture(scope="module")
def queries():
    return gen_dataset(NQ, DIM, seed=2)


class TestDenseBruteForce:
    @pytest.mark.parametrize("metric", ["L2", "IP", "COSINE"])
    def test_knn_matches_oracle(self, base, queries, metric):
        res = kt.BruteForce.Search(base, queries, {"metric_type": metric, "k": K})
        assert res.has_value(), res.what()
        gt_ids, gt_dists = brute_force_gt(base, queries, metric, K)
        recall = knn_recall(gt_ids, res.value().ids, NQ, K)
        assert recall >= BRUTE_FORCE_RECALL_THRESHOLD
        # distance parity with the fp64 oracle
        got = res.value().distance.reshape(NQ, K)
        np.testing.assert_allclose(np.sort(got, 1), np.sort(gt_dists, 1), rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("metric", ["L2", "IP"])
    def test_knn_with_bitset(self, base, queries, metric):
        bitset = gen_bitset(NB, 0.5)
        res = kt.BruteForce.Search(base, queries, {"metric_type": metric, "k": K}, bitset)
        assert res.has_value(), res.what()
        ids = res.value().ids.reshape(NQ, K)
        # no filtered-out id may appear
        for row in ids:
            for i in row:
                if i >= 0:
                    assert not bitset.test(int(i))
        gt_ids, _ = brute_force_gt(base, queries, metric, K, bitset)
        assert knn_recall(gt_ids, ids, NQ, K) >= BRUTE_FORCE_RECALL_THRESHOLD

    def test_heavy_filter_pads_with_minus_one(self, base, queries):
        filtered = np.ones(NB, dtype=bool)
        filtered[:3] = False  # only 3 rows survive
        bitset = kt.BitsetView.from_bool_array(filtered)
        res = kt.BruteForce.Search(base, queries, {"metric_type": "L2", "k": K}, bitset)
        ids = res.value().ids.reshape(NQ, K)
        assert (ids[:, 3:] == -1).all()
        assert set(ids[:, :3].flatten().tolist()) <= {0, 1, 2}

    def test_invalid_metric(self, base, queries):
        res = kt.BruteForce.Search(base, queries, {"metric_type": "HAMMING", "k": K})
        assert not res.has_value()
        assert res.error() == kt.Status.invalid_metric_type

    def test_search_with_buf(self, base, queries):
        ids_buf = np.zeros(NQ * K, dtype=np.int64)
        dist_buf = np.zeros(NQ * K, dtype=np.float32)
        st = kt.BruteForce.SearchWithBuf(base, queries, ids_buf, dist_buf, {"metric_type": "L2", "k": K})
        assert st == kt.Status.success
        gt_ids, _ = brute_force_gt(base, queries, "L2", K)
        assert knn_recall(gt_ids, ids_buf, NQ, K) >= BRUTE_FORCE_RECALL_THRESHOLD


class TestRangeSearch:
    def test_l2_radius(self, base, queries):
        gt_ids, gt_dists = brute_force_gt(base, queries, "L2", 50)
        radius = float(np.median(gt_dists[:, 20]))
        res = kt.BruteForce.RangeSearch(base, queries, {"metric_type": "L2", "radius": radius})
        assert res.has_value(), res.what()
        ds = res.value()
        assert ds.lims[-1] > 0
        xb = np.asarray(base.tensor, np.float64)
        xq = np.asarray(queries.tensor, np.float64)
        for qi in range(NQ):
            for j in range(ds.lims[qi], ds.lims[qi + 1]):
                d = ((xq[qi] - xb[ds.ids[j]]) ** 2).sum()
                assert d < radius + 1e-2

    def test_ip_two_sided(self, base, queries):
        res = kt.BruteForce.RangeSearch(
            base, queries, {"metric_type": "IP", "radius": 5.0, "range_filter": 20.0}
        )
        assert res.has_value(), res.what()
        ds = res.value()
        d = ds.distance
        assert ((d > 5.0) & (d <= 20.0 + 1e-3)).all()


class TestBinaryBruteForce:
    NBITS = 256

    @pytest.mark.parametrize("metric", ["HAMMING", "JACCARD"])
    def test_binary_metrics(self, metric):
        base = gen_binary_dataset(300, self.NBITS, seed=3)
        queries = gen_binary_dataset(5, self.NBITS, seed=4)
        res = kt.BruteForce.Search(base, queries, {"metric_type": metric, "k": 5})
        assert res.has_value(), res.what()
        # oracle via numpy bit ops
        xb = np.unpackbits(np.asarray(base.tensor), axis=1, bitorder="little")
        xq = np.unpackbits(np.asarray(queries.tensor), axis=1, bitorder="little")
        if metric == "HAMMING":
            gt = (xq[:, None, :] != xb[None, :, :]).sum(-1).astype(np.float64)
        else:
            inter = (xq[:, None, :] & xb[None, :, :]).sum(-1).astype(np.float64)
            union = (xq[:, None, :] | xb[None, :, :]).sum(-1).astype(np.float64)
            gt = 1.0 - inter / np.maximum(union, 1)
        order = np.argsort(gt, axis=1, kind="stable")[:, :5]
        recall = knn_recall(order, res.value().ids, 5, 5)
        assert recall >= 0.9  # ties may reorder

        got = np.sort(res.value().distance.reshape(5, 5), 1)
        want = np.sort(np.take_along_axis(gt, order, 1), 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_substructure(self):
        rng = np.random.default_rng(5)
        xb = rng.integers(0, 256, size=(50, 8), dtype=np.uint8)
        # query 0 = subset of base row 7
        q = (xb[7] & np.uint8(0b10101010))[None, :]
        base = kt.GenDataSet(50, 64, xb)
        queries = kt.GenDataSet(1, 64, q)
        res = kt.BruteForce.Search(base, queries, {"metric_type": "SUBSTRUCTURE", "k": 3})
        assert res.has_value(), res.what()
        top = res.value().ids.reshape(1, 3)
        d = res.value().distance.reshape(1, 3)
        assert d[0, 0] == 0.0  # exact substructure match found
        qbits = np.unpackbits(q, axis=1, bitorder="little")
        bbits = np.unpackbits(xb[top[0, 0]][None], axis=1, bitorder="little")
        assert ((qbits & ~bbits) == 0).all()


class TestSparseBruteForce:
    def test_ip(self):
        base = gen_sparse_dataset(200, 100, seed=6)
        queries = gen_sparse_dataset(5, 100, seed=7)
        res = kt.BruteForce.Search(base, queries, {"metric_type": "IP", "k": 5})
        assert res.has_value(), res.what()
        ids = res.value().ids.reshape(5, 5)
        dist = res.value().distance.reshape(5, 5)
        # verify scores against direct dict dot products
        for qi, qrow in enumerate(queries.tensor):
            for j in range(5):
                if ids[qi, j] < 0:
                    continue
                brow = base.tensor[ids[qi, j]]
                want = sum(v * brow.get(dim, 0.0) for dim, v in qrow.items())
                assert abs(want - dist[qi, j]) < 1e-4

    def test_bm25(self):
        base = gen_sparse_dataset(100, 50, seed=8)
        queries = gen_sparse_dataset(3, 50, seed=9)
        res = kt.BruteForce.Search(
            base,
            queries,
            {"metric_type": "BM25", "k": 5, "bm25_k1": 1.2, "bm25_b": 0.75, "bm25_avgdl": 4.0},
        )
        assert res.has_value(), res.what()
        assert (res.value().distance >= 0).all()

    def test_bm25_requires_params(self):
        base = gen_sparse_dataset(10, 20)
        queries = gen_sparse_dataset(2, 20)
        res = kt.BruteForce.Search(base, queries, {"metric_type": "BM25", "k": 2})
        assert not res.has_value()
        assert res.error() == kt.Status.invalid_param_in_json


class TestBruteForceIterator:
    def test_iterator_sorted(self, base, queries):
        res = kt.BruteForce.AnnIterator(base, queries, {"metric_type": "L2"})
        assert res.has_value(), res.what()
        its = res.value()
        assert len(its) == NQ
        it = its[0]
        prev = -1.0
        for _ in range(50):
            assert it.HasNext()
            _i, d = it.Next()
            assert d >= prev
            prev = d


def test_search_sparse_named_entrypoint():
    """reference brute_force.h:50-57 SearchSparse / SearchSparseWithBuf."""
    from .utils import gen_sparse_dataset
    base = gen_sparse_dataset(200, 64, seed=91)
    q = gen_sparse_dataset(8, 64, seed=92)
    r = kt.BruteForce.SearchSparse(base, q, {"metric_type": "IP", "k": 5})
    assert r.has_value(), r.what()
    ids = np.asarray(r.value().ids).reshape(8, 5)
    ibuf = np.empty(8 * 5, np.int64)
    dbuf = np.empty(8 * 5, np.float32)
    st = kt.BruteForce.SearchSparseWithBuf(base, q, ibuf, dbuf, {"metric_type": "IP", "k": 5})
    assert st == kt.Status.success
    np.testing.assert_array_equal(ibuf.reshape(8, 5), ids)
    # dense dataset through the sparse entrypoint errors
    dense = gen_dataset(50, 16, seed=93)
    assert not kt.BruteForce.SearchSparse(dense, q, {"metric_type": "IP", "k": 5}).has_value()


def test_ann_iterator_on_chunk():
    """reference brute_force.h AnnIteratorOnChunk: multi-chunk base, global
    ids, merged exact-distance streams."""
    rng = np.random.default_rng(94)
    c1 = rng.standard_normal((100, 32)).astype(np.float32)
    c2 = rng.standard_normal((150, 32)).astype(np.float32)
    q = c2[:4] + 0.001 * rng.standard_normal((4, 32)).astype(np.float32)
    res = kt.BruteForce.AnnIteratorOnChunk(
        [kt.GenDataSetFromArray(c1), kt.GenDataSetFromArray(c2)],
        kt.GenDataSetFromArray(q),
        {"metric_type": "L2"},
    )
    assert res.has_value(), res.what()
    its = res.value()
    assert len(its) == 4
    # top-1 of query i must be global id 100 + i (the row in chunk 2)
    for i, it in enumerate(its):
        rid, _ = it.Next()
        assert rid == 100 + i, (i, rid)


def test_search_on_chunk_with_buf():
    """reference brute_force.h:38-42: exact top-k over a chunked base into
    caller buffers; ids global over the concatenated row space."""
    import numpy as np
    import knowhere_tpu as kt

    rng = np.random.default_rng(7)
    c1 = rng.standard_normal((40, 16)).astype(np.float32)
    c2 = rng.standard_normal((60, 16)).astype(np.float32)
    xq = np.concatenate([c1[:2], c2[:2]])
    k = 5
    ids = np.empty((4, k), np.int64)
    dist = np.empty((4, k), np.float32)
    st = kt.BruteForce.SearchOnChunkWithBuf(
        [kt.GenDataSetFromArray(c1), kt.GenDataSetFromArray(c2)],
        kt.GenDataSetFromArray(xq),
        ids, dist, {"metric_type": "L2", "k": k},
    )
    assert st == kt.Status.success, st
    # self rows: q0->0, q1->1 (chunk1), q2->40, q3->41 (global ids)
    assert ids[0, 0] == 0 and ids[1, 0] == 1
    assert ids[2, 0] == 40 and ids[3, 0] == 41
    np.testing.assert_allclose(dist[:, 0], 0.0, atol=1e-4)
    # parity with single-chunk search over the concatenation
    full = kt.BruteForce.Search(
        kt.GenDataSetFromArray(np.concatenate([c1, c2])),
        kt.GenDataSetFromArray(xq), {"metric_type": "L2", "k": k},
    )
    np.testing.assert_array_equal(ids, full.value().ids.reshape(4, k))
