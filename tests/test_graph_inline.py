"""Inline-neighborhood graph fast path (ops/graph_inline.py).

Forces KNOWHERE_GRAPH_INLINE=1 so the path builds on small CPU-mesh corpora
(it auto-enables only at >=100k rows). Coverage: recall parity with the
general walk, filtered search, serialization roundtrip, SQ variant, and
eligibility gating — reference behavior model: tests/ut/test_faiss_hnsw.cc.
"""

import numpy as np
import pytest

import knowhere_tpu as kt
from .utils import (
    KNN_RECALL_THRESHOLD,
    brute_force_gt,
    gen_bitset,
    gen_dataset,
    knn_recall,
)

NB, NQ, DIM, K = 2048, 10, 64, 10


@pytest.fixture(scope="module")
def base():
    return gen_dataset(NB, DIM, seed=71)


@pytest.fixture(scope="module")
def queries():
    return gen_dataset(NQ, DIM, seed=72)


@pytest.fixture()
def force_inline(monkeypatch):
    monkeypatch.setenv("KNOWHERE_GRAPH_INLINE", "1")


def build(name, base, tcfg):
    idx = kt.IndexFactory.Instance().Create(name).value()
    st = idx.Build(base, tcfg)
    assert st == kt.Status.success, st
    return idx


class TestInlinePath:
    @pytest.mark.parametrize("name,tcfg", [
        ("HNSW", {"M": 16, "efConstruction": 200}),
        ("HNSW_SQ", {"M": 16, "efConstruction": 200, "sq_type": "SQ8"}),
        ("HNSW_PQ", {"M": 16, "efConstruction": 200, "m": 16}),
        ("HNSW_PRQ", {"M": 16, "efConstruction": 200, "m": 8, "nrq": 2}),
    ])
    @pytest.mark.parametrize("metric", ["L2", "IP", "COSINE"])
    def test_recall_and_active(self, force_inline, base, queries, name, tcfg, metric):
        idx = build(name, base, {"metric_type": metric, **tcfg})
        assert idx._node._inline is not None, "inline store should build when forced"
        res = idx.Search(queries, {"metric_type": metric, "k": K, "ef": 64})
        assert res.has_value(), res.what()
        gt_ids, _ = brute_force_gt(base, queries, metric, K)
        rec = knn_recall(gt_ids, res.value().ids, NQ, K)
        assert rec >= KNN_RECALL_THRESHOLD, f"{name} {metric} inline recall {rec}"

    def test_matches_general_path_quality(self, force_inline, base, queries):
        """Inline and general walks are both exact-reranked; top-1 self-hit."""
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        assert idx._node._inline is not None
        xb = np.asarray(base.tensor)
        res = idx.Search(kt.GenDataSetFromArray(xb[:8]), {"k": 5, "ef": 64})
        ids = res.value().ids.reshape(8, 5)
        assert (ids[:, 0] == np.arange(8)).all(), "self row must be top-1 (exact rerank)"

    def test_filtered(self, force_inline, base, queries):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        assert idx._node._inline is not None
        gt_ids, _ = brute_force_gt(base, queries, "L2", 1)
        excluded = set(int(g) for g in gt_ids.reshape(-1))
        mask = np.zeros(NB, dtype=bool)
        for e in excluded:
            mask[e] = True
        bits = np.packbits(mask, bitorder="little")
        bitset = kt.BitsetView(bits, NB)
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "ef": 64}, bitset)
        assert res.has_value(), res.what()
        got = res.value().ids.reshape(NQ, K)
        assert not (np.isin(got, list(excluded))).any(), "filtered ids must not surface"

    def test_filtered_recall(self, force_inline, base, queries):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        bitset = gen_bitset(NB, 0.3, seed=9)
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "ef": 64}, bitset)
        gt_ids, _ = brute_force_gt(base, queries, "L2", K, bitset=bitset)
        rec = knn_recall(gt_ids, res.value().ids, NQ, K)
        assert rec >= KNN_RECALL_THRESHOLD, f"filtered inline recall {rec}"

    def test_serialize_roundtrip(self, force_inline, base, queries):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        bs = kt.BinarySet()
        assert idx.Serialize(bs) == kt.Status.success
        idx2 = kt.IndexFactory.Instance().Create("HNSW").value()
        assert idx2.Deserialize(bs) == kt.Status.success
        assert idx2._node._inline is not None, "inline store must rebuild on load"
        r1 = idx.Search(queries, {"k": K, "ef": 64}).value().ids
        r2 = idx2.Search(queries, {"k": K, "ef": 64}).value().ids
        assert np.array_equal(np.asarray(r1), np.asarray(r2))

    def test_disabled_by_env(self, monkeypatch, base, queries):
        monkeypatch.setenv("KNOWHERE_GRAPH_INLINE", "0")
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        assert idx._node._inline is None
        res = idx.Search(queries, {"k": K, "ef": 64})
        assert res.has_value()

    def test_auto_gating_small_corpus(self, base):
        # default mode: small corpora stay on the general path
        import os
        assert os.environ.get("KNOWHERE_GRAPH_INLINE", "auto") != "1"
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        assert idx._node._inline is None

    def test_incremental_add_refreshes(self, force_inline, base):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        t0 = idx._node._inline.table
        xb2 = gen_dataset(64, DIM, seed=99)
        assert idx.Add(xb2, {"metric_type": "L2"}) == kt.Status.success
        # search flushes pending rows and rebuilds the inline table
        res = idx.Search(gen_dataset(4, DIM, seed=98), {"k": 5, "ef": 64})
        assert res.has_value()
        assert idx._node._inline is not None
        assert idx._node._inline.table.shape[0] == NB + 64
        assert idx._node._inline.table is not t0


class TestInline4Bit:
    """4-bit nibble-plane walk codes (KNOWHERE_INLINE_BITS=4): half the table,
    measured recall-neutral with the exact rerank."""

    @pytest.fixture()
    def force4(self, monkeypatch):
        monkeypatch.setenv("KNOWHERE_GRAPH_INLINE", "1")
        monkeypatch.setenv("KNOWHERE_INLINE_BITS", "4")

    @pytest.mark.parametrize("name,tcfg", [
        ("HNSW", {"M": 16, "efConstruction": 200}),
        ("HNSW_SQ", {"M": 16, "efConstruction": 200, "sq_type": "SQ8"}),
    ])
    def test_recall(self, force4, base, queries, name, tcfg):
        idx = build(name, base, {"metric_type": "L2", **tcfg})
        inline = idx._node._inline
        assert inline is not None and inline.bits == 4
        # 4-bit rows are half the 8-bit width
        from knowhere_tpu.ops.graph_inline import inline_row_words
        assert inline.table.shape[1] == inline_row_words(inline.deg, DIM, 4)
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "ef": 64})
        gt_ids, _ = brute_force_gt(base, queries, "L2", K)
        rec = knn_recall(gt_ids, res.value().ids, NQ, K)
        assert rec >= KNN_RECALL_THRESHOLD, f"{name} 4-bit recall {rec}"

    def test_self_top1_exact(self, force4, base):
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16, "efConstruction": 200})
        xb = np.asarray(base.tensor)
        res = idx.Search(kt.GenDataSetFromArray(xb[:8]), {"k": 5, "ef": 64})
        ids = res.value().ids.reshape(8, 5)
        assert (ids[:, 0] == np.arange(8)).all()

    def test_dim_not_multiple_of_8_falls_back(self, force4, monkeypatch):
        xb = gen_dataset(2048, 36, seed=73)  # 36 % 8 != 0, 36 % 4 == 0
        idx = build("HNSW", xb, {"metric_type": "L2", "M": 8, "efConstruction": 80})
        inline = idx._node._inline
        assert inline is not None and inline.bits == 8  # byte-code fallback
        res = idx.Search(gen_dataset(4, 36, seed=74), {"k": 5, "ef": 32})
        assert res.has_value()


class TestMaskedPoolWidth:
    """Regression: the masked walk must exact-rerank an ef-wide valid pool,
    not a k-wide one. With 4-bit walk codes a k-wide approximately-ranked
    pool collapses filtered recall (measured 0.97 -> 0.78 at ANY ratio on
    the 1M bench corpus) while the unmasked path reranks the full beam.
    Here: filtered recall at a mild ratio must stay within 0.1 of the
    unfiltered recall on the same corpus (red on the k-wide-pool bug, where
    it loses ~0.4)."""

    def test_filtered_recall_parity(self, force_inline):
        rng = np.random.default_rng(5)
        nb, d, nq, k = 4096, 64, 64, 10
        nclu = 20
        cents = (rng.standard_normal((nclu, d)) * 3).astype(np.float32)
        xb = (cents[rng.integers(0, nclu, nb)]
              + rng.standard_normal((nb, d))).astype(np.float32)
        xq = (cents[rng.integers(0, nclu, nq)]
              + rng.standard_normal((nq, d))).astype(np.float32)
        base = kt.GenDataSetFromArray(xb)
        queries = kt.GenDataSetFromArray(xq)
        idx = build("HNSW", base, {"metric_type": "L2", "M": 16,
                                   "efConstruction": 200})
        assert idx._node._inline is not None
        cfg = {"metric_type": "L2", "k": k, "ef": 64,
               "disable_fallback_brute_force": True}
        res_u = idx.Search(queries, cfg)
        gt_u, _ = brute_force_gt(base, queries, "L2", k)
        rec_u = knn_recall(gt_u, res_u.value().ids, nq, k)
        bitset = gen_bitset(nb, 0.2, seed=6)
        res_f = idx.Search(queries, cfg, bitset)
        gt_f, _ = brute_force_gt(base, queries, "L2", k, bitset=bitset)
        rec_f = knn_recall(gt_f, res_f.value().ids, nq, k)
        assert rec_f >= rec_u - 0.1, (rec_f, rec_u)
