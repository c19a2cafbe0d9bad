"""DISKANN lifecycle: bin-file build -> deserialize -> disk-reranked search
(reference coverage model: tests/ut/test_diskann.cc with LocalFileManager)."""

import os

import numpy as np
import pytest

import knowhere_tpu as kt
from .utils import KNN_RECALL_THRESHOLD, brute_force_gt, gen_bitset, gen_dataset, knn_recall

NB, NQ, DIM, K = 2000, 8, 64, 10


class LocalFileManager:
    """Mirrors milvus::LocalFileManager used in the reference tests — a no-op
    for local disk, but records the calls so injection is observable."""

    def __init__(self):
        self.loaded, self.added = [], []

    def LoadFile(self, path):
        self.loaded.append(path)
        return True

    def AddFile(self, path):
        self.added.append(path)
        return os.path.exists(path)


def write_diskann_bin(path: str, x: np.ndarray) -> None:
    with open(path, "wb") as f:
        np.asarray([x.shape[0], x.shape[1]], dtype=np.int32).tofile(f)
        x.tofile(f)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("diskann")
    x = np.asarray(gen_dataset(NB, DIM, seed=81).tensor)
    data_path = str(tmp / "raw.bin")
    write_diskann_bin(data_path, x)
    prefix = str(tmp / "idx")
    fm = LocalFileManager()
    created = kt.IndexFactory.Instance().Create("DISKANN", object=fm)
    assert created.has_value(), created.what()
    idx = created.value()
    st = idx.Build(
        kt.DataSet(),
        {
            "metric_type": "L2",
            "index_prefix": prefix,
            "data_path": data_path,
            "max_degree": 32,
            "search_list_size": 64,
            "pq_code_budget_gb": 32 * NB / 1e9,  # 32 bytes/vector
            "build_dram_budget_gb": 2.0,
        },
    )
    assert st == kt.Status.success, st
    assert fm.added  # files went through the FileManager
    return x, prefix, fm


def load(prefix, fm, extra=None):
    idx = kt.IndexFactory.Instance().Create("DISKANN", object=fm).value()
    cfg = {"metric_type": "L2", "index_prefix": prefix}
    cfg.update(extra or {})
    st = idx.Deserialize(kt.BinarySet(), cfg)
    assert st == kt.Status.success, st
    return idx


class TestDiskANN:
    def test_search_before_load_fails(self, built):
        x, prefix, fm = built
        idx = kt.IndexFactory.Instance().Create("DISKANN", object=fm).value()
        q = kt.GenDataSetFromArray(x[:NQ])
        res = idx.Search(q, {"metric_type": "L2", "k": K})
        assert not res.has_value()
        assert res.error() == kt.Status.empty_index

    def test_recall(self, built):
        x, prefix, fm = built
        idx = load(prefix, fm)
        assert idx.Count() == NB and idx.Dim() == DIM
        q_arr = x[:NQ] + 0.01 * np.random.default_rng(0).standard_normal((NQ, DIM)).astype(np.float32)
        queries = kt.GenDataSetFromArray(q_arr)
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "search_list_size": 100})
        assert res.has_value(), res.what()
        base_ds = kt.GenDataSetFromArray(x)
        gt, _ = brute_force_gt(base_ds, queries, "L2", K)
        rec = knn_recall(gt, res.value().ids, NQ, K)
        assert rec >= KNN_RECALL_THRESHOLD, rec

    def test_filtered(self, built):
        x, prefix, fm = built
        idx = load(prefix, fm)
        queries = kt.GenDataSetFromArray(x[:NQ])
        bitset = gen_bitset(NB, 0.4)
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "search_list_size": 100}, bitset)
        for i in res.value().ids:
            if i >= 0:
                assert not bitset.test(int(i))

    def test_node_cache_budget(self, built):
        x, prefix, fm = built
        # budget large enough to pin everything in HBM
        idx = load(prefix, fm, {"search_cache_budget_gb": 1.0, "warm_up": True})
        queries = kt.GenDataSetFromArray(x[:NQ])
        res = idx.Search(queries, {"metric_type": "L2", "k": K, "search_list_size": 100})
        assert res.has_value()
        ids = res.value().ids.reshape(NQ, K)
        assert (ids[:, 0] == np.arange(NQ)).mean() >= 0.9  # self-recall

    def test_partial_node_cache_exact_match(self, built):
        """A partial HBM node cache (budget < corpus) must not change results:
        rerank is exact whether a row comes from the cache slab or disk
        (reference: PQFlashIndex node cache is a transparent IO cache)."""
        x, prefix, fm = built
        queries = kt.GenDataSetFromArray(x[:NQ])
        cfg = {"metric_type": "L2", "k": K, "search_list_size": 100}
        base = load(prefix, fm).Search(queries, cfg).value()
        row_gb = DIM * 4 / 1e9
        for extra in (
            {"search_cache_budget_gb": row_gb * (NB // 2)},  # ~50% stride cache
            {"search_cache_budget_gb": row_gb * (NB // 2), "use_bfs_cache": True},
        ):
            idx = load(prefix, fm, extra)
            node = idx.node
            assert node._cache_rows is not None and node._cache_rows.shape[0] < NB
            res = idx.Search(queries, cfg).value()
            np.testing.assert_array_equal(res.ids, base.ids)
            np.testing.assert_allclose(res.distance, base.distance, rtol=1e-4, atol=1e-4)

    def test_get_vector_by_ids(self, built):
        x, prefix, fm = built
        idx = load(prefix, fm)
        ids = np.array([3, 77, 1500])
        res = idx.GetVectorByIds(kt.GenIdsDataSet(ids))
        assert res.has_value(), res.what()
        np.testing.assert_allclose(res.value().tensor, x[ids], rtol=1e-6)

    def test_range_search(self, built):
        x, prefix, fm = built
        idx = load(prefix, fm)
        queries = kt.GenDataSetFromArray(x[:4])
        base_ds = kt.GenDataSetFromArray(x)
        _, gt_d = brute_force_gt(base_ds, queries, "L2", 50)
        radius = float(np.median(gt_d[:, 25]))
        res = idx.RangeSearch(queries, {"metric_type": "L2", "radius": radius, "min_k": 50})
        assert res.has_value(), res.what()
        assert res.value().lims[-1] > 0
        assert (res.value().distance < radius + 1e-3).all()

    def test_iterator(self, built):
        x, prefix, fm = built
        idx = load(prefix, fm)
        queries = kt.GenDataSetFromArray(x[:2])
        res = idx.AnnIterator(queries, {"metric_type": "L2"})
        assert res.has_value(), res.what()
        it = res.value()[0]
        prev = -np.inf
        for _ in range(50):
            assert it.HasNext()
            _i, d = it.Next()
            assert d >= prev - 1e-5
            prev = d

    def test_build_requires_paths(self):
        idx = kt.IndexFactory.Instance().Create("DISKANN").value()
        st = idx.Build(kt.DataSet(), {"metric_type": "L2"})
        assert st == kt.Status.invalid_param_in_json

    def test_rebuild_on_existing_prefix_rejected(self, built):
        x, prefix, fm = built
        idx = kt.IndexFactory.Instance().Create("DISKANN", object=fm).value()
        st = idx.Build(
            kt.DataSet(),
            {"metric_type": "L2", "index_prefix": prefix, "data_path": prefix + "nope"},
        )
        assert st == kt.Status.index_already_trained
