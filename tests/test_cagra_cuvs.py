"""cuVS / CAGRA config surface + knob translation (models/cagra.py).

Parity targets: src/index/gpu_cuvs/gpu_cuvs_cagra_config.h (knob list,
defaults, ranges), index_param.h:157-186. The translation contract:
itopk_size -> ef, graph_degree -> 2*M, intermediate_graph_degree -> inter,
refine_ratio -> refine_k, kmeans_n_iters/trainset_fraction -> Lloyd trainer.
"""

import numpy as np
import pytest

import knowhere_tpu as kt

NB, NQ, K, DIM = 4000, 16, 10, 64


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    xb = rng.standard_normal((NB, DIM), dtype=np.float32)
    xq = xb[:NQ] + 0.005 * rng.standard_normal((NQ, DIM), dtype=np.float32)
    return xb, xq


@pytest.mark.parametrize("name", ["GPU_CUVS_CAGRA", "GPU_CAGRA", "TPU_CAGRA"])
def test_cagra_builds_and_searches(name, data):
    xb, xq = data
    idx = kt.IndexFactory.Instance().Create(name).value()
    st = idx.Build(kt.GenDataSetFromArray(xb), {
        "metric_type": "L2",
        "graph_degree": 32,
        "intermediate_graph_degree": 64,
        "nn_descent_niter": 20,
        "build_algo": "NN_DESCENT",
    })
    assert st == kt.Status.success, st
    # graph_degree -> M translation: final degree = 2*M = graph_degree
    assert idx.node._M == 16
    r = idx.Search(
        kt.GenDataSetFromArray(xq),
        {"metric_type": "L2", "k": K, "itopk_size": 64, "search_width": 1},
        kt.BitsetView(),
    )
    assert r.has_value(), r.what()
    ids = r.value().ids.reshape(NQ, K)
    assert (ids[:, 0] == np.arange(NQ)).mean() >= 0.9


def test_cagra_itopk_changes_operating_point(data):
    xb, xq = data
    idx = kt.IndexFactory.Instance().Create("GPU_CUVS_CAGRA").value()
    assert idx.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2"}) == kt.Status.success
    gt = kt.BruteForce.Search(
        kt.GenDataSetFromArray(xb), kt.GenDataSetFromArray(xq),
        {"metric_type": "L2", "k": K},
    ).value().ids.reshape(NQ, K)

    def rec(cfg):
        r = idx.Search(kt.GenDataSetFromArray(xq), {"metric_type": "L2", "k": K, **cfg}, kt.BitsetView())
        ids = r.value().ids.reshape(NQ, K)
        return np.mean([len(set(gt[i].tolist()) & set(ids[i].tolist())) / K for i in range(NQ)])

    assert rec({"itopk_size": 256}) >= rec({"itopk_size": 16}) - 1e-9


def test_cagra_config_validation():
    idx = kt.IndexFactory.Instance().Create("GPU_CUVS_CAGRA").value()
    xb = np.zeros((256, DIM), np.float32)
    # team_size range is [0, 32] (gpu_cuvs_cagra_config.h)
    r = idx.Search(  # facade validates before dispatch
        kt.GenDataSetFromArray(xb[:1]),
        {"metric_type": "L2", "k": 1, "team_size": 64},
        kt.BitsetView(),
    )
    assert not r.has_value()
    assert r.error() == kt.Status.out_of_range_in_json
    # hashmap_max_fill_rate range [0.1, 0.9]
    r = idx.Search(
        kt.GenDataSetFromArray(xb[:1]),
        {"metric_type": "L2", "k": 1, "hashmap_max_fill_rate": 0.95},
        kt.BitsetView(),
    )
    assert not r.has_value()
    assert r.error() == kt.Status.out_of_range_in_json


@pytest.mark.parametrize("name", ["GPU_CUVS_IVF_FLAT", "GPU_CUVS_IVF_PQ"])
def test_cuvs_ivf_builds_and_searches(name, data):
    xb, xq = data
    idx = kt.IndexFactory.Instance().Create(name).value()
    cfg = {"metric_type": "L2", "nlist": 16, "kmeans_n_iters": 8,
           "kmeans_trainset_fraction": 0.5, "cache_dataset_on_device": True}
    assert idx.Build(kt.GenDataSetFromArray(xb), cfg) == kt.Status.success
    r = idx.Search(
        kt.GenDataSetFromArray(xq),
        {"metric_type": "L2", "k": K, "nprobe": 8, "refine_ratio": 2.0},
        kt.BitsetView(),
    )
    assert r.has_value(), r.what()
    ids = r.value().ids.reshape(NQ, K)
    assert (ids[:, 0] == np.arange(NQ)).mean() >= 0.8


def test_cuvs_ivf_pq_auto_m(data):
    """cuVS m=0 means auto pq_dim selection."""
    xb, _ = data
    idx = kt.IndexFactory.Instance().Create("GPU_CUVS_IVF_PQ").value()
    assert idx.Build(
        kt.GenDataSetFromArray(xb), {"metric_type": "L2", "nlist": 8}
    ) == kt.Status.success
    assert idx.node._pq is not None
    m = idx.node._pq.codebooks.shape[0]
    assert m >= 1 and DIM % m == 0


def test_cuvs_ivf_pq_nbits_range(data):
    """cuVS limits nbits to [4, 8] (gpu_cuvs_ivf_pq_config.h)."""
    xb, _ = data
    idx = kt.IndexFactory.Instance().Create("GPU_CUVS_IVF_PQ").value()
    st = idx.Build(
        kt.GenDataSetFromArray(xb), {"metric_type": "L2", "nlist": 8, "nbits": 16}
    )
    assert st == kt.Status.out_of_range_in_json
