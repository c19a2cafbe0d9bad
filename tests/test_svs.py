"""SVS family (Intel Scalable Vector Search surface): svs_* knob mapping,
real LVQ storage semantics, serialization (reference coverage model:
tests/ut/test_index_svs.cc; storage kinds in src/index/svs/svs_vamana.cc)."""

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.ops import quant as Q

from .utils import (
    KNN_RECALL_THRESHOLD,
    brute_force_gt,
    gen_dataset,
    knn_recall,
)

NB, NQ, DIM, K = 2000, 10, 64, 10


@pytest.fixture(scope="module")
def base():
    return gen_dataset(NB, DIM, seed=171)


@pytest.fixture(scope="module")
def queries():
    return gen_dataset(NQ, DIM, seed=172)


def build(name, base, tcfg):
    created = kt.IndexFactory.Instance().Create(name)
    assert created.has_value(), created.what()
    idx = created.value()
    st = idx.Build(base, tcfg)
    assert st == kt.Status.success, st
    return idx


SVS_KNOBS = {
    "svs_graph_max_degree": 16,
    "svs_construction_window_size": 150,
    "svs_alpha": 1.2,
}


@pytest.mark.parametrize("name", ["SVS_FLAT", "SVS_VAMANA", "SVS_VAMANA_LVQ", "SVS_VAMANA_LEANVEC"])
@pytest.mark.parametrize("metric", ["L2", "IP"])
def test_recall(base, queries, name, metric):
    tcfg = {"metric_type": metric}
    scfg = {"metric_type": metric, "k": K}
    if name != "SVS_FLAT":
        tcfg.update(SVS_KNOBS)
        scfg["svs_search_window_size"] = 64
    idx = build(name, base, tcfg)
    res = idx.Search(queries, scfg)
    assert res.has_value(), res.what()
    gt_ids, _ = brute_force_gt(base, queries, metric, K)
    rec = knn_recall(gt_ids, res.value().ids, NQ, K)
    assert rec >= KNN_RECALL_THRESHOLD, f"{name} {metric} recall {rec}"


def test_lvq_store_is_per_vector(base, queries):
    """The LVQ node must carry the per-vector codec payload (not global SQ8)."""
    idx = build(
        "SVS_VAMANA_LVQ", base, {"metric_type": "L2", **SVS_KNOBS}
    )
    node = idx.node
    assert node._kind == "lvq"
    assert node._payload["codes"].dtype == np.uint8
    assert node._payload["lvq_off"].shape == (NB,)
    assert node._payload["lvq_scale"].shape == (NB,)
    assert node._payload["lvq_mean"].shape == (DIM,)


def test_lvq_beats_global_sq8_on_heteroscale_rows():
    """LVQ's raison d'etre (SVS paper): rows with wildly different scales.
    A few large-magnitude rows blow up the global SQ8 grid for everyone;
    the per-vector grid keeps small rows precise."""
    rng = np.random.default_rng(99)
    x = rng.standard_normal((512, 32)).astype(np.float32)
    x[::17] *= 100.0  # outlier rows widen the global grid
    sq = Q.sq_train(x, "SQ8")
    sq_rec = np.asarray(
        Q.sq_decode_dev(
            sq, np.asarray(Q.sq_encode(sq, x)), sq.vmin, sq.vdiff
        )
    )
    lvq = Q.lvq_train(x)
    codes, off, scale = Q.lvq_encode(lvq, x)
    lvq_rec = np.asarray(Q.lvq_decode_dev(codes, off, scale, lvq.mean))
    small = np.ones(len(x), bool)
    small[::17] = False
    sq_err = np.linalg.norm(sq_rec[small] - x[small], axis=1).mean()
    lvq_err = np.linalg.norm(lvq_rec[small] - x[small], axis=1).mean()
    assert lvq_err < sq_err / 4, (lvq_err, sq_err)


def test_lvq_serialize_roundtrip(base, queries):
    idx = build("SVS_VAMANA_LVQ", base, {"metric_type": "L2", **SVS_KNOBS})
    binset = kt.BinarySet()
    assert idx.Serialize(binset) == kt.Status.success
    created = kt.IndexFactory.Instance().Create("SVS_VAMANA_LVQ")
    idx2 = created.value()
    assert idx2.Deserialize(binset, {}) == kt.Status.success
    scfg = {"metric_type": "L2", "k": K, "svs_search_window_size": 64}
    r1 = idx.Search(queries, scfg).value().ids
    r2 = idx2.Search(queries, scfg).value().ids
    np.testing.assert_array_equal(r1, r2)


def test_lvq_add_after_build(base):
    idx = build("SVS_VAMANA_LVQ", base, {"metric_type": "L2", **SVS_KNOBS})
    extra = gen_dataset(64, DIM, seed=173)
    st = idx.Add(extra, {"metric_type": "L2"})
    assert st == kt.Status.success, st
    # appended rows must be findable: query WITH the new rows themselves
    res = idx.Search(extra, {"metric_type": "L2", "k": 1, "svs_search_window_size": 64})
    assert res.has_value(), res.what()
    found = res.value().ids.reshape(-1)
    hit = np.mean((found >= NB) & (found < NB + 64))
    assert hit >= 0.5, f"only {hit:.0%} of appended rows found themselves"
