"""Config system: defaults, ranges, stages, error codes (reference coverage
model: tests/ut/test_config.cc)."""

import pytest

import knowhere_tpu as kt
from knowhere_tpu.config import BaseConfig, Config, Entry, Stage
from knowhere_tpu.status import Status


class DemoConfig(BaseConfig):
    nlist = Entry(int, default=128, range=(1, 65536), stages=[Stage.TRAIN])
    nprobe = Entry(int, default=8, range=(1, 65536), stages=[Stage.SEARCH, Stage.ITERATOR])


class TestConfigLoad:
    def test_defaults_applied(self):
        cfg = DemoConfig()
        st, _ = Config.load(cfg, {}, Stage.TRAIN)
        assert st == Status.success
        assert cfg.nlist == 128
        assert cfg.metric_type == "L2"

    def test_stage_scoping(self):
        cfg = DemoConfig()
        st, _ = Config.load(cfg, {}, Stage.TRAIN)
        assert st == Status.success
        assert cfg.nprobe is None  # search-only field untouched at train

    def test_out_of_range(self):
        cfg = DemoConfig()
        st, msg = Config.load(cfg, {"nlist": 0}, Stage.TRAIN)
        assert st == Status.out_of_range_in_json
        assert "nlist" in msg

    def test_type_conflict(self):
        cfg = DemoConfig()
        st, _ = Config.load(cfg, {"nlist": "abc"}, Stage.TRAIN)
        assert st == Status.type_conflict_in_json

    def test_string_coercion(self):
        # Milvus passes numerics as strings; the reference coerces them.
        cfg = DemoConfig()
        st, _ = Config.load(cfg, {"nlist": "256"}, Stage.TRAIN)
        assert st == Status.success
        assert cfg.nlist == 256

    def test_float_to_int_rejects_fraction(self):
        cfg = DemoConfig()
        st, _ = Config.load(cfg, {"nlist": 1.5}, Stage.TRAIN)
        assert st == Status.type_conflict_in_json

    def test_unknown_keys_ignored(self):
        cfg = DemoConfig()
        st, _ = Config.load(cfg, {"totally_unknown": 5}, Stage.TRAIN)
        assert st == Status.success

    def test_metric_uppercased(self):
        cfg = DemoConfig()
        st, _ = Config.load(cfg, {"metric_type": "l2"}, Stage.TRAIN)
        assert st == Status.success
        assert cfg.metric_type == "L2"

    def test_k_default_and_range(self):
        cfg = DemoConfig()
        st, _ = Config.load(cfg, {}, Stage.SEARCH)
        assert st == Status.success and cfg.k == 10
        cfg2 = DemoConfig()
        st, _ = Config.load(cfg2, {"k": 0}, Stage.SEARCH)
        assert st == Status.out_of_range_in_json

    def test_range_filter_sentinel(self):
        cfg = DemoConfig()
        st, _ = Config.load(cfg, {"radius": 2.0}, Stage.RANGE_SEARCH)
        assert st == Status.success
        assert cfg.radius == 2.0
        assert cfg.range_filter == float("inf")

    def test_bool_coercion(self):
        class BC(BaseConfig):
            flagged = Entry(bool, default=False, stages=[Stage.TRAIN])

        cfg = BC()
        st, _ = Config.load(cfg, {"flagged": "true"}, Stage.TRAIN)
        assert st == Status.success and cfg.flagged is True


class TestStaticFaced:
    def test_config_check(self):
        st = kt.IndexStaticFaced.ConfigCheck("FLAT", "fp32", {"metric_type": "L2"})
        assert st == Status.success
        st = kt.IndexStaticFaced.ConfigCheck("NOPE", "fp32", {})
        assert st == Status.invalid_index_error

    def test_estimate_load_resource(self):
        res = kt.IndexStaticFaced.EstimateLoadResource("FLAT", "fp32", 1.0, {})
        assert res.has_value()
        assert res.value()["memory_gb"] == 1.0
        res = kt.IndexStaticFaced.EstimateLoadResource("FLAT", "fp32", 1.0, {"enable_mmap": True})
        assert res.value()["memory_gb"] < 1.0
