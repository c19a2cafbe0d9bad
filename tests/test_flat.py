"""FLAT index end-to-end: build -> search -> range -> iterator -> serialize ->
deserialize -> mmap file load (the §7.1 minimum slice; reference coverage
model: tests/ut/test_search.cc FLAT cases + test_get_vector.cc)."""

import os

import numpy as np
import pytest

import knowhere_tpu as kt
from .utils import (
    BRUTE_FORCE_RECALL_THRESHOLD,
    brute_force_gt,
    gen_bitset,
    gen_dataset,
    knn_recall,
)

NB, NQ, DIM, K = 1000, 10, 128, 10


@pytest.fixture(scope="module")
def base():
    return gen_dataset(NB, DIM, seed=11)


@pytest.fixture(scope="module")
def queries():
    return gen_dataset(NQ, DIM, seed=12)


def make_flat(metric="L2"):
    created = kt.IndexFactory.Instance().Create("FLAT")
    assert created.has_value(), created.what()
    return created.value()


class TestFlatIndex:
    @pytest.mark.parametrize("metric", ["L2", "IP", "COSINE"])
    def test_build_search(self, base, queries, metric):
        idx = make_flat()
        st = idx.Build(base, {"metric_type": metric})
        assert st == kt.Status.success
        assert idx.Count() == NB and idx.Dim() == DIM
        res = idx.Search(queries, {"metric_type": metric, "k": K})
        assert res.has_value(), res.what()
        gt_ids, _ = brute_force_gt(base, queries, metric, K)
        assert knn_recall(gt_ids, res.value().ids, NQ, K) >= BRUTE_FORCE_RECALL_THRESHOLD

    def test_search_before_build_fails(self, queries):
        idx = make_flat()
        res = idx.Search(queries, {"k": K})
        assert not res.has_value()
        assert res.error() == kt.Status.empty_index

    def test_filtered_search(self, base, queries):
        idx = make_flat()
        idx.Build(base, {"metric_type": "L2"})
        bitset = gen_bitset(NB, 0.3)
        res = idx.Search(queries, {"metric_type": "L2", "k": K}, bitset)
        assert res.has_value(), res.what()
        for i in res.value().ids:
            if i >= 0:
                assert not bitset.test(int(i))

    def test_bitset_size_mismatch(self, base, queries):
        idx = make_flat()
        idx.Build(base, {"metric_type": "L2"})
        wrong = gen_bitset(NB + 5, 0.5)
        res = idx.Search(queries, {"k": K}, wrong)
        assert not res.has_value()
        assert res.error() == kt.Status.invalid_args

    def test_range_search(self, base, queries):
        idx = make_flat()
        idx.Build(base, {"metric_type": "L2"})
        _, gt_dists = brute_force_gt(base, queries, "L2", 50)
        radius = float(np.median(gt_dists[:, 20]))
        res = idx.RangeSearch(queries, {"metric_type": "L2", "radius": radius})
        assert res.has_value(), res.what()
        assert res.value().lims[-1] > 0

    def test_iterator(self, base, queries):
        idx = make_flat()
        idx.Build(base, {"metric_type": "L2"})
        res = idx.AnnIterator(queries, {"metric_type": "L2"})
        assert res.has_value(), res.what()
        it = res.value()[0]
        ids_seen, prev = set(), -1.0
        for _ in range(NB):
            if not it.HasNext():
                break
            i, d = it.Next()
            assert d >= prev
            prev = d
            ids_seen.add(i)
        assert len(ids_seen) == NB  # exact iterator visits everything

    def test_get_vector_by_ids(self, base):
        idx = make_flat()
        idx.Build(base, {"metric_type": "L2"})
        ids = np.array([3, 7, 500])
        res = idx.GetVectorByIds(kt.GenIdsDataSet(ids))
        assert res.has_value(), res.what()
        np.testing.assert_array_equal(res.value().tensor, np.asarray(base.tensor)[ids])
        bad = idx.GetVectorByIds(kt.GenIdsDataSet(np.array([NB + 1])))
        assert not bad.has_value()

    def test_has_raw_data(self, base):
        idx = make_flat()
        assert idx.HasRawData("L2")

    def test_serialize_roundtrip(self, base, queries):
        idx = make_flat()
        idx.Build(base, {"metric_type": "L2"})
        binset = kt.BinarySet()
        assert idx.Serialize(binset) == kt.Status.success
        idx2 = make_flat()
        assert idx2.Deserialize(binset) == kt.Status.success
        assert idx2.Count() == NB
        r1 = idx.Search(queries, {"k": K}).value()
        r2 = idx2.Search(queries, {"k": K}).value()
        np.testing.assert_array_equal(r1.ids, r2.ids)

    def test_deserialize_from_file_mmap(self, base, queries, tmp_path):
        idx = make_flat()
        idx.Build(base, {"metric_type": "L2"})
        binset = kt.BinarySet()
        idx.Serialize(binset)
        path = os.path.join(tmp_path, "flat.kwtpu")
        with open(path, "wb") as f:
            f.write(binset.GetByName(idx.Type()).tobytes())
        idx2 = make_flat()
        st = idx2.DeserializeFromFile(path, {"enable_mmap": True})
        assert st == kt.Status.success
        r2 = idx2.Search(queries, {"k": K})
        assert r2.has_value(), r2.what()
        gt_ids, _ = brute_force_gt(base, queries, "L2", K)
        assert knn_recall(gt_ids, r2.value().ids, NQ, K) >= BRUTE_FORCE_RECALL_THRESHOLD

    def test_incremental_add(self, queries):
        x1 = gen_dataset(400, DIM, seed=13)
        x2 = gen_dataset(600, DIM, seed=14)
        idx = make_flat()
        assert idx.Train(x1, {"metric_type": "L2"}) == kt.Status.success
        assert idx.Add(x1, {"metric_type": "L2"}) == kt.Status.success
        assert idx.Add(x2, {"metric_type": "L2"}) == kt.Status.success
        assert idx.Count() == 1000

    def test_build_async(self, base, queries):
        idx = make_flat()
        interrupt = idx.BuildAsync(base, {"metric_type": "L2"})
        assert interrupt.Get(timeout=60) == kt.Status.success
        assert idx.Count() == NB


class TestBinFlat:
    def test_bin_flat(self):
        from .utils import gen_binary_dataset

        base = gen_binary_dataset(200, 128, seed=15)
        queries = gen_binary_dataset(4, 128, seed=16)
        created = kt.IndexFactory.Instance().Create("BIN_FLAT", data_type="bin1")
        assert created.has_value(), created.what()
        idx = created.value()
        assert idx.Build(base, {"metric_type": "HAMMING"}) == kt.Status.success
        res = idx.Search(queries, {"metric_type": "HAMMING", "k": 5})
        assert res.has_value(), res.what()
        xb = np.unpackbits(np.asarray(base.tensor), axis=1, bitorder="little")
        xq = np.unpackbits(np.asarray(queries.tensor), axis=1, bitorder="little")
        gt = np.argsort((xq[:, None, :] != xb[None, :, :]).sum(-1), axis=1, kind="stable")[:, :5]
        assert knn_recall(gt, res.value().ids, 4, 5) >= 0.9


class TestFactory:
    def test_unknown_index(self):
        res = kt.IndexFactory.Instance().Create("DOES_NOT_EXIST")
        assert not res.has_value()
        assert res.error() == kt.Status.invalid_index_error

    def test_bad_version(self):
        res = kt.IndexFactory.Instance().Create("FLAT", version=99)
        assert not res.has_value()

    def test_features(self):
        feats = kt.IndexFactory.Instance().GetIndexFeatures()
        assert feats["FLAT"] & kt.feature.KNN
        assert feats["FLAT"] & kt.feature.MMAP
