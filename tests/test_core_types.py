"""Core types: Status/expected, DataSet, BinarySet, BitsetView, version/feature
tables (reference coverage model: tests/ut/test_error_code.cc,
test_binaryset.cc, test_index_check.cc)."""

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.status import Status, StatusCategory, status_category_of


class TestStatus:
    def test_every_status_categorized(self):
        for s in Status:
            assert status_category_of(s) in StatusCategory

    def test_category_semantics(self):
        assert status_category_of(Status.success) == StatusCategory.success
        assert status_category_of(Status.invalid_args) == StatusCategory.input_error
        assert status_category_of(Status.invalid_metric_type) == StatusCategory.input_error
        assert status_category_of(Status.not_implemented) == StatusCategory.permanent_error
        assert status_category_of(Status.timeout) == StatusCategory.transient_error
        assert status_category_of(Status.malloc_error) == StatusCategory.transient_error

    def test_expected(self):
        ok = kt.expected.Ok(42)
        assert ok.has_value() and ok.value() == 42
        err = kt.expected.Err(Status.invalid_args, "bad")
        assert not err.has_value()
        assert err.error() == Status.invalid_args
        assert err.what() == "bad"
        with pytest.raises(kt.KnowhereException):
            err.value()


class TestDataSet:
    def test_dense_roundtrip(self):
        x = np.arange(12, dtype=np.float32).reshape(3, 4)
        ds = kt.GenDataSetFromArray(x)
        assert ds.rows == 3 and ds.dim == 4
        np.testing.assert_array_equal(ds.tensor, x)

    def test_result_dataset_contract(self):
        ids = np.array([[1, 2], [3, -1]])
        dist = np.array([[0.1, 0.2], [0.3, 0.0]])
        ds = kt.GenResultDataSet(2, 2, ids, dist)
        assert ds.rows == 2 and ds.dim == 2
        assert ds.ids.shape == (4,)
        assert ds.ids.dtype == np.int64
        assert ds.distance.dtype == np.float32

    def test_sparse(self):
        ds = kt.GenSparseDataSet([{1: 0.5}, {2: 1.0, 7: 0.25}], dim=10)
        assert ds.is_sparse
        assert ds.rows == 2 and ds.dim == 10


class TestBinarySet:
    def test_append_get(self):
        bs = kt.BinarySet()
        bs.Append("IVF", b"\x01\x02\x03")
        assert bs.Contains("IVF")
        assert bs.GetByName("IVF").size == 3
        assert bs.GetByName("nope") is None
        assert bs.Size() == 3


class TestBitsetView:
    def test_semantics(self):
        filtered = np.array([True, False, True, False, False, False, False, True, True])
        bv = kt.BitsetView.from_bool_array(filtered)
        assert bv.size() == 9
        assert bv.count() == 4
        assert bv.test(0) and not bv.test(1)
        assert abs(bv.filter_ratio() - 4 / 9) < 1e-9
        keep = bv.host_mask(9)
        np.testing.assert_array_equal(keep, ~filtered)

    def test_empty(self):
        bv = kt.BitsetView.empty()
        assert bv.empty_view()
        assert bv.count() == 0
        assert bv.host_mask(5).all()

    def test_id_offset(self):
        filtered = np.zeros(16, dtype=bool)
        filtered[10] = True
        bv = kt.BitsetView.from_bool_array(filtered)
        bv.set_id_offset(8)
        keep = bv.host_mask(8)
        assert not keep[2]  # row 2 + offset 8 == bit 10
        assert keep[0]


class TestVersionFeature:
    def test_version_gate(self):
        assert kt.Version.VersionSupport(kt.Version.GetCurrentVersion())
        assert kt.Version.VersionSupport(kt.Version.GetMinimalVersion())
        assert not kt.Version.VersionSupport(kt.Version(99))

    def test_legality_tables(self):
        assert kt.KnowhereCheck.IndexTypeAndDataTypeCheck("FLAT", "fp32")
        assert kt.KnowhereCheck.IndexTypeAndDataTypeCheck("BIN_FLAT", "bin1")
        assert not kt.KnowhereCheck.IndexTypeAndDataTypeCheck("BIN_FLAT", "fp32")
        assert not kt.KnowhereCheck.IndexTypeAndDataTypeCheck("SPARSE_WAND", "fp32")
        assert kt.KnowhereCheck.SupportMmapIndexTypeCheck("HNSW")
        assert kt.KnowhereCheck.SupportEmbListIndexTypeCheck("FLAT")


class TestSerializeFormat:
    def test_roundtrip_and_zero_copy(self):
        from knowhere_tpu.io.serialize import read_sections, write_sections

        a = np.arange(100, dtype=np.float32).reshape(10, 10)
        b = np.arange(7, dtype=np.int64)
        blob = write_sections({"a": a, "b": b}, meta={"dim": 10, "metric": "L2"})
        arrays, meta_out = read_sections(blob)
        np.testing.assert_array_equal(arrays["a"], a)
        np.testing.assert_array_equal(arrays["b"], b)
        assert meta_out["dim"] == 10

    def test_bad_magic(self):
        from knowhere_tpu.io.serialize import read_sections

        with pytest.raises(kt.KnowhereException) as ei:
            read_sections(b"garbage-data-here")
        assert ei.value.status == Status.invalid_binary_set


class TestFacadeParityMethods:
    """Facade methods added for reference index.h parity:
    CalcDistByIDs / GetEmbListByIds / IsAdditionalScalarSupported /
    IsIndexRefineEnabled (reference index.h:176-190)."""

    def test_calc_dist_by_ids(self):
        import knowhere_tpu as kt
        import numpy as np

        xb = np.random.default_rng(1).standard_normal((64, 16)).astype(np.float32)
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        assert idx.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2"}).name == "success"
        q = kt.GenDataSetFromArray(xb[:2])
        res = idx.CalcDistByIDs(q, None, np.array([0, 5, 9]), 3)
        assert res.has_value(), res.what()
        d = np.asarray(res.value())
        np.testing.assert_allclose(d[0, 0], 0.0, atol=1e-4)  # self distance

    def test_is_refine_enabled(self):
        import knowhere_tpu as kt
        import numpy as np

        xb = np.random.default_rng(2).standard_normal((256, 16)).astype(np.float32)
        plain = kt.IndexFactory.Instance().Create("HNSW").value()
        plain.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2", "M": 8, "efConstruction": 50})
        assert plain.IsIndexRefineEnabled() is False
        ref = kt.IndexFactory.Instance().Create("HNSW").value()
        ref.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2", "M": 8,
                                               "efConstruction": 50, "refine": True})
        assert ref.IsIndexRefineEnabled() is True

    def test_is_additional_scalar_supported(self):
        import knowhere_tpu as kt
        import numpy as np

        xb = np.random.default_rng(3).standard_normal((256, 16)).astype(np.float32)
        h = kt.IndexFactory.Instance().Create("HNSW").value()
        h.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2", "M": 8, "efConstruction": 50})
        assert h.IsAdditionalScalarSupported() is True
        f = kt.IndexFactory.Instance().Create("FLAT").value()
        f.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2"})
        assert f.IsAdditionalScalarSupported() is False

    def test_get_emb_list_by_ids(self):
        import knowhere_tpu as kt
        import numpy as np

        rng = np.random.default_rng(4)
        lims = np.array([0, 3, 5, 9], np.int64)
        tokens = rng.standard_normal((9, 8)).astype(np.float32)
        ds = kt.DataSet(tensor=tokens, lims=lims, rows=9, dim=8)
        idx = kt.IndexFactory.Instance().Create("HNSW").value()
        st = idx.Build(ds, {"metric_type": "MAX_SIM_IP", "M": 8, "efConstruction": 50,
                            "emb_list_strategy": "tokenann"})
        assert st.name == "success", st
        got = idx.GetEmbListByIds(kt.DataSet(ids=np.array([1, 0])), "MAX_SIM_IP")
        assert got.has_value(), got.what()
        v = got.value()
        out_lims = np.asarray(v.get("lims"))
        assert out_lims.tolist() == [0, 2, 5]
        np.testing.assert_allclose(np.asarray(v.tensor)[:2], tokens[3:5], atol=1e-6)
        np.testing.assert_allclose(np.asarray(v.tensor)[2:], tokens[0:3], atol=1e-6)
        # non-emb_list index -> not_implemented
        f = kt.IndexFactory.Instance().Create("FLAT").value()
        f.Build(kt.GenDataSetFromArray(tokens), {"metric_type": "L2"})
        bad = f.GetEmbListByIds(kt.DataSet(ids=np.array([0])))
        assert not bad.has_value()
