"""Compat shim + wrappers + feder (reference coverage model: the pytest E2E
suite over the SWIG wheel, tests/python/test_index_with_sift.py style,
plus test_feder.cc)."""

import json

import numpy as np
import pytest

import knowhere_tpu.compat as knowhere
import knowhere_tpu as kt
from .utils import brute_force_gt, gen_dataset, knn_recall


class TestCompatShim:
    def test_swig_style_flow(self):
        rng = np.random.default_rng(111)
        xb = rng.standard_normal((2000, 64)).astype(np.float32)
        xq = rng.standard_normal((5, 64)).astype(np.float32)

        idx = knowhere.CreateIndex("IVF_FLAT", knowhere.GetCurrentVersion())
        st = idx.Build(knowhere.ArrayToDataSet(xb), json.dumps({"metric_type": "L2", "nlist": 32}))
        assert st == knowhere.Status.success
        res, st = idx.Search(
            knowhere.ArrayToDataSet(xq), json.dumps({"metric_type": "L2", "k": 5, "nprobe": 16})
        )
        assert st == knowhere.Status.success
        dists, ids = knowhere.DataSetToArray(res)
        assert dists.shape == (5, 5) and ids.shape == (5, 5)
        gt, _ = brute_force_gt(kt.GenDataSetFromArray(xb), kt.GenDataSetFromArray(xq), "L2", 5)
        assert knn_recall(gt, ids, 5, 5) >= 0.6

    def test_binset_dump_load(self, tmp_path):
        rng = np.random.default_rng(112)
        xb = rng.standard_normal((500, 32)).astype(np.float32)
        idx = knowhere.CreateIndex("FLAT")
        idx.Build(knowhere.ArrayToDataSet(xb), json.dumps({"metric_type": "L2"}))
        binset = knowhere.GetBinarySet()
        assert idx.Serialize(binset) == knowhere.Status.success
        path = str(tmp_path / "dump.bin")
        knowhere.Dump(binset, path)
        binset2 = knowhere.GetBinarySet()
        assert knowhere.Load(binset2, path)
        idx2 = knowhere.CreateIndex("FLAT")
        assert idx2.Deserialize(binset2) == knowhere.Status.success
        assert idx2.Count() == 500

    def test_brute_force_and_bitset(self):
        rng = np.random.default_rng(113)
        xb = rng.standard_normal((300, 32)).astype(np.float32)
        res, st = knowhere.BruteForceSearch(
            knowhere.ArrayToDataSet(xb),
            knowhere.ArrayToDataSet(xb[:2]),
            json.dumps({"metric_type": "L2", "k": 3}),
            knowhere.GetNullBitSetView(),
        )
        assert st == knowhere.Status.success
        _, ids = knowhere.DataSetToArray(res)
        assert ids[0, 0] == 0

    def test_sparse_dataset(self):
        data = np.array([0.5, 1.0, 0.25], np.float32)
        indices = np.array([1, 0, 2], np.int32)
        indptr = np.array([0, 1, 3], np.int64)
        ds = knowhere.ArrayToSparseDataSet(data, indices, indptr)
        assert ds.is_sparse and ds.rows == 2


class TestWrappers:
    def test_mock_wrapper_casts(self):
        from knowhere_tpu.wrappers import IndexNodeDataMockWrapper
        from knowhere_tpu.models.flat import FlatIndexNode
        from knowhere_tpu.config import Config, Stage

        inner = FlatIndexNode(version=8)
        wrap = IndexNodeDataMockWrapper(inner)
        x16 = np.random.default_rng(0).standard_normal((100, 16)).astype(np.float16)
        ds = kt.GenDataSetFromArray(x16)
        cfg = wrap.CreateConfig()
        Config.load(cfg, {"metric_type": "L2"}, Stage.TRAIN)
        assert wrap.Build(ds, cfg) == kt.Status.success
        assert inner._xb.dtype == np.float32

    def test_threadpool_wrapper_serializes(self):
        from knowhere_tpu.wrappers import IndexNodeThreadPoolWrapper
        from knowhere_tpu.models.flat import FlatIndexNode
        from knowhere_tpu.config import Config, Stage

        inner = FlatIndexNode(version=8)
        wrap = IndexNodeThreadPoolWrapper(inner)
        ds = gen_dataset(100, 16)
        cfg = wrap.CreateConfig()
        Config.load(cfg, {"metric_type": "L2"}, Stage.TRAIN)
        assert wrap.Build(ds, cfg) == kt.Status.success
        assert wrap.Count() == 100


class TestFeder:
    def test_overview_and_visit(self):
        base = gen_dataset(500, 32, seed=115)
        idx = kt.IndexFactory.Instance().Create("HNSW").value()
        idx.Build(base, {"metric_type": "L2", "M": 8, "efConstruction": 64})
        meta = idx.GetIndexMeta({"overview_levels": 2})
        assert meta.has_value(), meta.what()
        info = json.loads(meta.value().get("json_info"))
        assert info["type"] == "HNSW" and len(info["overview_levels"]) == 2

        from knowhere_tpu.config import Config, Stage

        cfg = idx.node.CreateConfig()
        Config.load(cfg, {"metric_type": "L2", "k": 5, "ef": 32}, Stage.SEARCH)
        visit = idx.node.GetFederVisit(gen_dataset(2, 32, seed=116), cfg)
        assert visit.has_value(), visit.what()
        traces = json.loads(visit.value().get("json_id_set"))
        assert len(traces) == 2 and len(traces[0]) > 5
        assert all("id" in t and "distance" in t and "source" in t for t in traces[0])

    def test_ivf_overview_and_visit(self):
        """IVF feder (reference include/knowhere/feder/IVFFlat.h)."""
        base = gen_dataset(2000, 32, seed=117)
        idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
        idx.Build(base, {"metric_type": "L2", "nlist": 16})
        meta = idx.GetIndexMeta({})
        assert meta.has_value(), meta.what()
        info = json.loads(meta.value().get("json_info"))
        assert info["nlist"] == 16 and sum(info["list_sizes"]) == 2000

        from knowhere_tpu.config import Config, Stage

        cfg = idx.node.CreateConfig()
        Config.load(cfg, {"metric_type": "L2", "k": 5, "nprobe": 4}, Stage.SEARCH)
        visit = idx.node.GetFederVisit(gen_dataset(3, 32, seed=118), cfg)
        assert visit.has_value(), visit.what()
        traces = json.loads(visit.value().get("json_id_set"))
        assert len(traces) == 3 and len(traces[0]) == 4
        assert all("list_id" in t and "size" in t for t in traces[0])


def test_swig_surface_helpers():
    """SWIG-parity helpers (reference knowhere.i:124-394): BitSet/SetBit,
    AnnIteratorWrap, converters, range-result dumpers, WriteIndexToDisk."""
    import numpy as np
    import tempfile, os
    from knowhere_tpu import compat as C

    rng = np.random.default_rng(9)
    xb = rng.standard_normal((128, 16)).astype(np.float32)
    idx = C.CreateIndex("FLAT")
    assert idx.Build(C.ArrayToDataSet(xb), '{"metric_type":"L2"}').name == "success"

    # BitSet: filter out row 0 -> its own query can't return it
    bs = C.BitSet(128)
    bs.SetBit(0)
    ds, st = idx.Search(C.ArrayToDataSet(xb[:1]), '{"metric_type":"L2","k":3}', bs.GetBitSetView())
    assert st.name == "success"
    dis, ids = C.DataSet2Array(ds)
    assert 0 not in ids[0].tolist()

    # iterator wrap
    its = C.GetAnnIterator(idx, C.ArrayToDataSet(xb[:1]), '{"metric_type":"L2"}')
    assert its[0].HasNext()
    i0, d0 = its[0].Next()
    assert i0 == 0 and abs(d0) < 1e-4

    # converters + dumpers
    t = C.DataSetTensor2Array(C.ArrayToDataSet(xb))
    assert t.shape == (128, 16)
    rr, st = idx.RangeSearch(C.ArrayToDataSet(xb[:2]), '{"metric_type":"L2","radius":1.0}')
    assert st.name == "success"
    lims = C.DumpRangeResultLimits(rr)
    assert lims[0] == 0 and len(C.DumpRangeResultIds(rr)) == lims[-1]
    assert len(C.DumpRangeResultDis(rr)) == lims[-1]

    # WriteIndexToDisk roundtrip via DeserializeFromFile-compatible blob
    from knowhere_tpu import BinarySet
    bset = BinarySet()
    assert idx.Serialize(bset).name == "success"
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "flat.bin")
        C.WriteIndexToDisk(bset, idx.Type(), path)
        assert os.path.getsize(path) > 0

    assert C.default_json_str() == "{}"
