"""Registry/feature-table consistency (reference tests/ut/test_index_check.cc):
every registered (index, dtype) creates, exposes a loadable config for every
stage, and its feature bits agree with the static legality tables."""

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.config import Config, Stage
from knowhere_tpu.factory import IndexFactory
from knowhere_tpu.feature import LEGAL_INDEX_DATATYPE, MMAP_CAPABLE, feature


def all_registrations():
    return sorted(IndexFactory.Instance()._registry.keys())


class TestRegistryConsistency:
    def test_every_registration_creates(self):
        for name, dt in all_registrations():
            created = IndexFactory.Instance().Create(name, data_type=dt)
            assert created.has_value(), (name, dt, created.what())
            idx = created.value()
            assert idx.Type() == name

    def test_every_config_loads_defaults(self):
        for name, dt in all_registrations():
            idx = IndexFactory.Instance().Create(name, data_type=dt).value()
            for stage in (Stage.TRAIN, Stage.SEARCH, Stage.RANGE_SEARCH, Stage.ITERATOR):
                cfg = idx.node.CreateConfig()
                st, msg = Config.load(cfg, {"metric_type": "L2"}, stage)
                assert st == kt.Status.success, (name, stage, msg)

    def test_feature_bits_match_datatypes(self):
        feats = IndexFactory.Instance().GetIndexFeatures()
        for name, dt in all_registrations():
            f = feats[name]
            if dt == "fp32":
                assert f & feature.FLOAT32, name
            if dt == "bin1":
                assert f & feature.BINARY, name
            if dt == "sparse":
                assert f & feature.SPARSE_FLOAT32, name

    def test_legality_table_covered_by_registry(self):
        # every legal (index, dtype) pair that names a first-party family must
        # actually be constructible
        reg = set(all_registrations())
        for pair in LEGAL_INDEX_DATATYPE:
            if pair[0] in {n for n, _ in reg}:
                assert pair in reg, pair

    def test_mmap_capable_indexes_deserialize_from_file(self, tmp_path):
        # spot-check one mmap-capable family end-to-end
        assert "IVF_SQ8" in MMAP_CAPABLE
        rng = np.random.default_rng(0)
        xb = rng.standard_normal((500, 32)).astype(np.float32)
        idx = IndexFactory.Instance().Create("IVF_SQ8").value()
        assert idx.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2", "nlist": 8}) == kt.Status.success
        binset = kt.BinarySet()
        idx.Serialize(binset)
        path = str(tmp_path / "ivfsq.kw")
        with open(path, "wb") as f:
            f.write(binset.GetByName("IVF_SQ8").tobytes())
        idx2 = IndexFactory.Instance().Create("IVF_SQ8").value()
        assert idx2.DeserializeFromFile(path, {"enable_mmap": True}) == kt.Status.success
        assert idx2.Count() == 500


class TestStaticTables:
    def test_version_in_registry_path(self):
        res = IndexFactory.Instance().Create("FLAT", version=kt.Version.GetMinimalVersion().VersionCode())
        assert res.has_value()

    def test_gpu_alias_share_engine(self):
        # TPU/GPU aliases must resolve to working engines
        for alias in ("TPU_BRUTE_FORCE", "GPU_CUVS_IVF_PQ", "TPU_CAGRA"):
            created = IndexFactory.Instance().Create(alias)
            assert created.has_value(), alias

    def test_reference_registration_name_parity(self):
        """Every index name the reference's open build registers must create
        here (reference flat.cc:418 BINFLAT, ivf.cc:1926 IVFBIN,
        faiss_hnsw.cc:3255-3261 HNSW_DEPRECATED, hnsw.cc:39
        HNSWLIB_DEPRECATED, diskann.cc:1070 DISKANN_DEPRECATED)."""
        for name, dt in (
            ("BINFLAT", "bin1"),
            ("IVFBIN", "bin1"),
            ("HNSW_DEPRECATED", "fp32"),
            ("HNSW_DEPRECATED", "bin1"),
            ("HNSWLIB_DEPRECATED", "fp32"),
            ("DISKANN_DEPRECATED", "fp32"),
        ):
            created = IndexFactory.Instance().Create(name, data_type=dt)
            assert created.has_value(), (name, dt)
        # CARDINAL_TIERED is gated behind KNOWHERE_WITH_CARDINAL in the
        # reference (closed-source plugin); the open build rejects it too
        assert not IndexFactory.Instance().Create("CARDINAL_TIERED").has_value()

    def test_use_disk_load(self):
        # reference src/common/utils.cc:133-146 (open build)
        assert kt.UseDiskLoad("DISKANN")
        assert kt.UseDiskLoad("MINHASH_LSH")
        assert kt.UseDiskLoad("AISAQ")
        assert not kt.UseDiskLoad("HNSW")
        assert not kt.UseDiskLoad("IVF_FLAT")
