"""emb_list (multi-vector) search: tokenann / MUVERA / LEMUR strategies,
MaxSim + DTW metrics (reference coverage model: tests/ut/test_emb_list.cc)."""

import numpy as np
import pytest

import knowhere_tpu as kt

NDOCS, DIM = 120, 32


def gen_emb_list(ndocs, dim, min_tok=3, max_tok=8, seed=0):
    rng = np.random.default_rng(seed)
    lims = [0]
    toks = []
    for _ in range(ndocs):
        n = rng.integers(min_tok, max_tok + 1)
        toks.append(rng.standard_normal((n, dim)).astype(np.float32))
        lims.append(lims[-1] + n)
    ds = kt.DataSet()
    ds.set("tensor", np.concatenate(toks))
    ds.lims = np.asarray(lims, dtype=np.int64)
    ds.rows = lims[-1]
    ds.dim = dim
    return ds


def maxsim_oracle(base_ds, q_ds, metric="MAX_SIM_IP"):
    """Exact numpy MaxSim scores (docs x queries)."""
    xb, bl = np.asarray(base_ds.tensor, np.float64), base_ds.lims
    xq, ql = np.asarray(q_ds.tensor, np.float64), q_ds.lims
    nq, nd = len(ql) - 1, len(bl) - 1
    scores = np.zeros((nq, nd))
    for i in range(nq):
        q = xq[ql[i]:ql[i + 1]]
        for j in range(nd):
            d = xb[bl[j]:bl[j + 1]]
            if metric.endswith("_L2"):
                sim = -(((q[:, None, :] - d[None, :, :]) ** 2).sum(-1))
            elif metric.endswith("_IP"):
                sim = q @ d.T
            else:  # cosine
                qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
                dn = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
                sim = qn @ dn.T
            scores[i, j] = sim.max(axis=1).sum()
    return scores


@pytest.fixture(scope="module")
def base():
    return gen_emb_list(NDOCS, DIM, seed=91)


@pytest.fixture(scope="module")
def queries():
    return gen_emb_list(5, DIM, min_tok=2, max_tok=4, seed=92)


def recall(gt_scores, ids, k):
    nq = ids.shape[0]
    hits = 0
    for i in range(nq):
        gt = set(np.argsort(-gt_scores[i])[:k].tolist())
        hits += len(gt & set(ids[i].tolist()) - {-1})
    return hits / (nq * k)


class TestEmbList:
    @pytest.mark.parametrize("strategy", ["tokenann", "muvera", "lemur"])
    def test_max_sim_ip(self, base, queries, strategy):
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        cfg = {"metric_type": "MAX_SIM_IP", "emb_list_strategy": strategy}
        if strategy == "lemur":
            cfg.update({"lemur_num_epochs": 2, "lemur_num_train_samples": 200, "lemur_hidden_dim": 32})
        st = idx.Build(base, cfg)
        assert st == kt.Status.success, st
        assert idx.Count() == NDOCS
        res = idx.Search(queries, {"metric_type": "MAX_SIM_IP", "k": 5, "retrieval_ann_ratio": 3.0})
        assert res.has_value(), res.what()
        gt = maxsim_oracle(base, queries, "MAX_SIM_IP")
        ids = res.value().ids.reshape(5, 5)
        assert recall(gt, ids, 5) >= 0.6, f"{strategy}"

    def test_max_sim_cosine_default(self, base, queries):
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        assert idx.Build(base, {"metric_type": "MAX_SIM"}) == kt.Status.success
        res = idx.Search(queries, {"metric_type": "MAX_SIM", "k": 5})
        gt = maxsim_oracle(base, queries, "MAX_SIM_COSINE")
        assert recall(gt, res.value().ids.reshape(5, 5), 5) >= 0.6

    def test_dtw(self, base, queries):
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        assert idx.Build(base, {"metric_type": "DTW_IP"}) == kt.Status.success
        res = idx.Search(queries, {"metric_type": "DTW_IP", "k": 5})
        assert res.has_value(), res.what()
        assert (res.value().ids >= -1).all()

    def test_doc_level_bitset(self, base, queries):
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        idx.Build(base, {"metric_type": "MAX_SIM_IP"})
        filtered = np.zeros(NDOCS, bool)
        filtered[::2] = True
        bitset = kt.BitsetView.from_bool_array(filtered)
        res = idx.Search(queries, {"metric_type": "MAX_SIM_IP", "k": 5}, bitset)
        assert res.has_value(), res.what()
        for i in res.value().ids:
            if i >= 0:
                assert i % 2 == 1

    def test_serialize_roundtrip(self, base, queries):
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        idx.Build(base, {"metric_type": "MAX_SIM_IP"})
        binset = kt.BinarySet()
        assert idx.Serialize(binset) == kt.Status.success
        idx2 = kt.IndexFactory.Instance().Create("FLAT").value()
        assert idx2.Deserialize(binset) == kt.Status.success
        assert idx2.Count() == NDOCS
        r1 = idx.Search(queries, {"metric_type": "MAX_SIM_IP", "k": 5}).value()
        r2 = idx2.Search(queries, {"metric_type": "MAX_SIM_IP", "k": 5}).value()
        np.testing.assert_array_equal(r1.ids, r2.ids)

    def test_unsupported_index_rejected(self, base):
        idx = kt.IndexFactory.Instance().Create("IVF_PQ").value()
        st = idx.Build(base, {"metric_type": "MAX_SIM_IP", "m": 8})
        assert st == kt.Status.invalid_metric_type


class TestMinHash:
    def test_mhjaccard(self):
        rng = np.random.default_rng(93)
        nb, dim, width = 200, 256, 32
        xb = rng.integers(0, 256, size=(nb, dim // 8), dtype=np.uint8)
        # near-duplicates of row 0: copy with 1 element changed
        xb[1] = xb[0].copy()
        xb[1, 0] ^= 0xFF
        base = kt.GenDataSet(nb, dim, xb)
        created = kt.IndexFactory.Instance().Create("MINHASH_LSH", data_type="bin1")
        assert created.has_value(), created.what()
        idx = created.value()
        st = idx.Build(base, {"metric_type": "MHJACCARD", "mh_element_bit_width": width, "mh_lsh_band": 4})
        assert st == kt.Status.success, st
        q = kt.GenDataSet(1, dim, xb[0:1])
        res = idx.Search(q, {"metric_type": "MHJACCARD", "k": 3, "mh_element_bit_width": width})
        assert res.has_value(), res.what()
        ids = res.value().ids
        d = res.value().distance
        assert ids[0] == 0 and d[0] == 1.0  # exact self match
        assert 1 in ids.tolist()  # near-duplicate found via shared bands

    def test_serialize(self):
        rng = np.random.default_rng(94)
        xb = rng.integers(0, 256, size=(100, 32), dtype=np.uint8)
        base = kt.GenDataSet(100, 256, xb)
        idx = kt.IndexFactory.Instance().Create("MINHASH_LSH", data_type="bin1").value()
        idx.Build(base, {"metric_type": "MHJACCARD", "mh_element_bit_width": 32, "mh_lsh_band": 4})
        binset = kt.BinarySet()
        assert idx.Serialize(binset) == kt.Status.success
        idx2 = kt.IndexFactory.Instance().Create("MINHASH_LSH", data_type="bin1").value()
        assert idx2.Deserialize(binset) == kt.Status.success
        assert idx2.Count() == 100


class TestScannDvr:
    def test_data_view_refine(self):
        rng = np.random.default_rng(95)
        xb = rng.standard_normal((1500, 64)).astype(np.float32)

        class View:
            def view_data(self, ids):
                return xb[ids]

        created = kt.IndexFactory.Instance().Create("SCANN_DVR", object=View())
        assert created.has_value(), created.what()
        idx = created.value()
        base = kt.GenDataSetFromArray(xb)
        st = idx.Build(base, {"metric_type": "L2", "nlist": 16, "sub_dim": 2})
        assert st == kt.Status.success, st
        assert not idx.HasRawData("L2")
        q = kt.GenDataSetFromArray(xb[:8])
        res = idx.Search(q, {"metric_type": "L2", "k": 5, "nprobe": 8, "reorder_k": 50})
        assert res.has_value(), res.what()
        ids = res.value().ids.reshape(8, 5)
        assert (ids[:, 0] == np.arange(8)).mean() >= 0.8

    def test_quantized_refine(self):
        rng = np.random.default_rng(96)
        xb = rng.standard_normal((1500, 64)).astype(np.float32)
        idx = kt.IndexFactory.Instance().Create("SCANN_DVR").value()
        st = idx.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2", "nlist": 16, "refine_type": 1})
        assert st == kt.Status.success, st
        q = kt.GenDataSetFromArray(xb[:8])
        res = idx.Search(q, {"metric_type": "L2", "k": 5, "nprobe": 8, "reorder_k": 50})
        ids = res.value().ids.reshape(8, 5)
        assert (ids[:, 0] == np.arange(8)).mean() >= 0.8


class TestAggregateOracles:
    """Hand-computed MaxSim/DTW aggregate pins (non-circular): tiny corpora
    where the best document is known analytically (reference
    emb_list_strategy MaxSim/DTW aggregation semantics)."""

    def test_max_sim_hand_case(self):
        import numpy as np
        # doc0 tokens aligned with both query tokens; doc1 matches only one
        lims = np.array([0, 2, 4], np.int64)
        tokens = np.array([[1, 0], [0, 1],      # doc0: e1, e2
                           [1, 0], [1, 0]],     # doc1: e1, e1
                          np.float32)
        q = np.array([[1, 0], [0, 1]], np.float32)  # query: e1 + e2
        ds = kt.DataSet(tensor=tokens, lims=lims, rows=4, dim=2)
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        st = idx.Build(ds, {"metric_type": "MAX_SIM_IP"})
        assert st == kt.Status.success, st
        qds = kt.DataSet(tensor=q, lims=np.array([0, 2], np.int64), rows=2, dim=2)
        res = idx.Search(qds, {"metric_type": "MAX_SIM_IP", "k": 2})
        assert res.has_value(), res.what()
        ids = res.value().ids.reshape(1, 2)
        d = res.value().distance.reshape(1, 2)
        # MaxSim(doc0) = 1 + 1 = 2; MaxSim(doc1) = 1 + 0 = 1
        assert ids[0, 0] == 0 and ids[0, 1] == 1, ids
        np.testing.assert_allclose(d[0], [2.0, 1.0], atol=1e-5)

    def test_dtw_monotone_alignment(self):
        import numpy as np
        from knowhere_tpu.models.emb_list import dtw_score
        # sim grid where the monotone path must skip the off-path maximum
        sim = np.array([[1.0, 0.0],
                        [0.0, 1.0]], np.float32)
        assert dtw_score(sim) == 2.0  # diagonal path
        sim2 = np.array([[0.0, 1.0],
                         [1.0, 0.0]], np.float32)
        # monotone path cannot take BOTH 1.0s (they are anti-diagonal):
        # best = 1.0 + 0.0 via (0,1)->(1,1) or (0,0)->(1,0) etc.
        assert dtw_score(sim2) == 1.0


def test_dtw_batch_matches_scalar():
    """dtw_scores_batch (anti-diagonal wavefront) equals the scalar DP."""
    from knowhere_tpu.models.emb_list import dtw_score, dtw_scores_batch

    rng = np.random.default_rng(3)
    nqt = 7
    seg_lens = [1, 3, 9, 4, 2]
    sim = rng.standard_normal((nqt, sum(seg_lens))).astype(np.float32)
    ends = np.cumsum(seg_lens)
    starts = ends - np.asarray(seg_lens)
    batch = dtw_scores_batch(sim, starts, ends)
    scalar = [dtw_score(sim[:, a:b]) for a, b in zip(starts, ends)]
    np.testing.assert_allclose(batch, scalar, rtol=1e-5)


def test_max_sim_batch_matches_scalar():
    from knowhere_tpu.models.emb_list import max_sim_score, max_sim_scores_batch

    rng = np.random.default_rng(4)
    seg_lens = [2, 5, 1, 8]
    sim = rng.standard_normal((6, sum(seg_lens))).astype(np.float32)
    ends = np.cumsum(seg_lens)
    starts = ends - np.asarray(seg_lens)
    batch = max_sim_scores_batch(sim, starts, ends)
    scalar = [max_sim_score(sim[:, a:b]) for a, b in zip(starts, ends)]
    np.testing.assert_allclose(batch, scalar, rtol=1e-6)


def test_muvera_num_projections_uncapped():
    """num_projections > 6 produces a genuinely wider FDE (the silent cap is
    gone, matching the reference's uncapped SimHash partitions)."""
    ds = gen_emb_list(30, 16, seed=11)
    qds = gen_emb_list(2, 16, seed=12)
    dims = {}
    for npj in (4, 8):
        cfg = {
            "metric_type": "MAX_SIM_IP", "k": 3,
            "emb_list_strategy": "muvera",
            "muvera_num_projections": npj, "muvera_num_repeats": 2,
            "retrieval_ann_ratio": 2.0,
        }
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        assert idx.Build(ds, cfg) == kt.Status.success
        r = idx.Search(qds, cfg, kt.BitsetView())
        assert r.has_value(), r.what()
        dims[npj] = idx._emb._under.Dim()
    # FDE width grows with num_projections (2^n_bits partitions per rep)
    assert dims[8] > dims[4], dims
