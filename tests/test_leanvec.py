"""SVS LeanVec: reduced-dim walk + full-dim rerank (models/hnsw.py VARIANT
'leanvec'; reference src/index/svs/svs_vamana.cc:522-526).

Round-1 history: a reduced-dim walk WITHOUT rerank was measured and rejected
(recall collapse). This variant implements what the reference actually ships
— the walk orders candidates in a PCA store at svs_leanvec_dim and the whole
search window reranks at full dim — and the A/B below records the result.
"""

import numpy as np

import knowhere_tpu as kt

NB, NQ, DIM, K = 3000, 64, 96, 10
KNOBS = {"svs_graph_max_degree": 24, "svs_construction_window_size": 80}


def _lowrank(nb, nq, d, intrinsic=24, seed=0):
    """Low-intrinsic-dim corpus — the regime LeanVec exists for."""
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((intrinsic, d)).astype(np.float32)
    W *= np.linspace(2.5, 0.3, intrinsic)[:, None].astype(np.float32)
    mk = lambda n: rng.standard_normal((n, intrinsic)).astype(np.float32) @ W
    return mk(nb), mk(nq)


def _recall(gt, ids):
    return np.mean([
        len(set(gt[i].tolist()) & set(ids[i].tolist()) - {-1}) / K
        for i in range(gt.shape[0])
    ])


def _search_recall(name, xb, xq, gt, extra_train=None, window=64):
    cfg = {"metric_type": "L2", **KNOBS, **(extra_train or {})}
    idx = kt.IndexFactory.Instance().Create(name).value()
    assert idx.Build(kt.GenDataSetFromArray(xb), cfg).name == "success"
    r = idx.Search(
        kt.GenDataSetFromArray(xq),
        {"metric_type": "L2", "k": K, "svs_search_window_size": window},
    )
    assert r.has_value(), r.what()
    return idx, _recall(gt, np.asarray(r.value().ids).reshape(NQ, K))


def test_leanvec_ab_vs_lvq_and_roundtrip():
    xb, xq = _lowrank(NB, NQ, DIM)
    bf = kt.BruteForce.Search(
        kt.GenDataSetFromArray(xb), kt.GenDataSetFromArray(xq),
        {"metric_type": "L2", "k": K},
    )
    gt = bf.value().ids.reshape(NQ, K)

    idx_lv, rec_lv = _search_recall(
        "SVS_VAMANA_LEANVEC", xb, xq, gt, {"svs_leanvec_dim": 32}
    )
    _, rec_lvq = _search_recall("SVS_VAMANA_LVQ", xb, xq, gt)

    node = idx_lv.node
    assert node._lv_proj is not None and node._lv_proj.shape == (DIM, 32)
    assert node._store["data"].shape[1] == 32  # the walk store IS reduced
    # A/B: on low-intrinsic-dim data the projected walk + full-dim rerank
    # must be within 3 recall points of the full-dim LVQ walk
    assert rec_lv >= rec_lvq - 0.03, (rec_lv, rec_lvq)
    assert rec_lv >= 0.85, rec_lv

    # serialize -> fresh node -> identical results
    bs = kt.BinarySet()
    assert idx_lv.Serialize(bs).name == "success"
    idx2 = kt.IndexFactory.Instance().Create("SVS_VAMANA_LEANVEC").value()
    assert idx2.Deserialize(bs, {"metric_type": "L2", **KNOBS}).name == "success"
    assert idx2.node._lv_proj is not None
    r1 = idx_lv.Search(kt.GenDataSetFromArray(xq), {"metric_type": "L2", "k": K,
                                                    "svs_search_window_size": 64})
    r2 = idx2.Search(kt.GenDataSetFromArray(xq), {"metric_type": "L2", "k": K,
                                                  "svs_search_window_size": 64})
    np.testing.assert_array_equal(
        np.asarray(r1.value().ids), np.asarray(r2.value().ids)
    )
