"""DiskANN build honesty: DRAM-budget sharded build+merge, disk_pq_dims,
accelerate_build (reference diskann_config.h:88-164,
thirdparty/DiskANN/src/aux_utils.cpp sharded build+merge,
partition_and_pq.cpp)."""

import numpy as np
import pytest

import knowhere_tpu as kt
from .utils import brute_force_gt, gen_dataset, knn_recall

NB, NQ, DIM, K = 6000, 8, 64, 10


def _write_bin(path, x):
    with open(path, "wb") as f:
        np.asarray([x.shape[0], x.shape[1]], dtype=np.int32).tofile(f)
        x.tofile(f)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("diskann_budget")
    ds = gen_dataset(NB, DIM, seed=5)
    x = np.asarray(ds.tensor)
    data_path = str(tmp / "raw.bin")
    _write_bin(data_path, x)
    q = gen_dataset(NQ, DIM, seed=6)
    gt_ids, _ = brute_force_gt(ds, q, "L2", K)
    return tmp, data_path, x, q, gt_ids


def _build_and_load(tmp, data_path, tag, extra):
    prefix = str(tmp / f"idx_{tag}")
    idx = kt.IndexFactory.Instance().Create("DISKANN").value()
    cfg = {
        "metric_type": "L2",
        "index_prefix": prefix,
        "data_path": data_path,
        "max_degree": 32,
        "search_list_size": 64,
        "pq_code_budget_gb": 32 * NB / 1e9,
        **extra,
    }
    st = idx.Build(kt.DataSet(), cfg)
    assert st == kt.Status.success, st
    st = idx.Deserialize(kt.BinarySet(), {"index_prefix": prefix})
    assert st == kt.Status.success, st
    return idx


def test_tiny_dram_budget_forces_sharded_build(data):
    """A corpus larger than build_dram_budget_gb still builds (per-shard
    Vamana + merge) and matches the recall contract."""
    tmp, data_path, x, q, gt = data
    # budget that fits ~1500 of the 6000 rows -> must shard
    budget_gb = 1500 * (DIM * 8 + 32 * 16) / 1e9
    idx = _build_and_load(tmp, data_path, "tiny", {"build_dram_budget_gb": budget_gb})
    stats = idx.node._build_stats
    assert stats["sharded"] is True
    assert stats["n_shards"] >= 2, stats
    r = idx.Search(q, {"metric_type": "L2", "k": K, "search_list_size": 128}, kt.BitsetView())
    assert r.has_value(), r.what()
    rec = knn_recall(gt, r.value().ids, NQ, K)
    assert rec >= 0.8, rec
    assert idx.Count() == NB


def test_large_budget_single_shot(data):
    tmp, data_path, x, q, gt = data
    idx = _build_and_load(tmp, data_path, "big", {"build_dram_budget_gb": 16.0})
    assert idx.node._build_stats["sharded"] is False
    r = idx.Search(q, {"metric_type": "L2", "k": K, "search_list_size": 128}, kt.BitsetView())
    rec = knn_recall(gt, r.value().ids, NQ, K)
    assert rec >= 0.8, rec


def test_disk_pq_dims_compresses_disk_payload(data):
    """disk_pq_dims > 0 stores PQ codes instead of raw rows on disk: the disk
    file shrinks, raw-data APIs refuse, search still reranks decently."""
    import os

    tmp, data_path, x, q, gt = data
    idx = _build_and_load(tmp, data_path, "dpq", {"disk_pq_dims": 32})
    idx_raw = _build_and_load(tmp, data_path, "noq", {})
    f_dpq = os.path.getsize(str(tmp / "idx_dpq") + "_kwtpu_disk.bin")
    f_raw = os.path.getsize(str(tmp / "idx_noq") + "_kwtpu_disk.bin")
    assert f_dpq < f_raw / 4, (f_dpq, f_raw)
    assert idx.node._disk_pq is not None
    assert not idx.node.HasRawData("L2")
    ds = kt.DataSet()
    ds.set("ids", np.asarray([0, 1], np.int64))
    ds.rows = 2
    assert not idx.GetVectorByIds(ds).has_value()
    r = idx.Search(q, {"metric_type": "L2", "k": K, "search_list_size": 128}, kt.BitsetView())
    rec = knn_recall(gt, r.value().ids, NQ, K)
    assert rec >= 0.6, rec  # PQ-decoded rerank is approximate


def test_accelerate_build_flag_observed(data):
    tmp, data_path, x, q, gt = data
    idx = _build_and_load(tmp, data_path, "accel", {"accelerate_build": True})
    assert idx.node._build_stats["accelerated"] is True
    r = idx.Search(q, {"metric_type": "L2", "k": K, "search_list_size": 128}, kt.BitsetView())
    rec = knn_recall(gt, r.value().ids, NQ, K)
    assert rec >= 0.6, rec  # faster build trades some graph quality


def test_aisaq_knobs_have_effect(data):
    """AISAQ-specific knobs map onto real mechanisms (no silent no-ops):
    num_entry_points caps the entry list; pq_cache_size funds the node cache;
    vectors_beamwidth bounds the walk beam."""
    tmp, data_path, x, q, gt = data
    prefix = str(tmp / "idx_aisaq")
    idx = kt.IndexFactory.Instance().Create("AISAQ").value()
    st = idx.Build(kt.DataSet(), {
        "metric_type": "L2", "index_prefix": prefix, "data_path": data_path,
        "max_degree": 32, "search_list_size": 64,
        "pq_code_budget_gb": 32 * NB / 1e9, "num_entry_points": 4,
    })
    assert st == kt.Status.success, st
    cache_gb = 2000 * DIM * 4 / 1e9  # pq_cache_size funds a 2000-row cache
    st = idx.Deserialize(kt.BinarySet(), {"index_prefix": prefix, "pq_cache_size": cache_gb})
    assert st == kt.Status.success, st
    assert np.asarray(idx.node._entry).shape[0] <= 4
    assert idx.node._cache_rows is not None  # pq_cache_size funded the cache
    r = idx.Search(q, {"metric_type": "L2", "k": K, "search_list_size": 128,
                       "vectors_beamwidth": 2}, kt.BitsetView())
    assert r.has_value(), r.what()
    rec = knn_recall(gt, r.value().ids, NQ, K)
    assert rec >= 0.6, rec
