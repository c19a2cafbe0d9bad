"""Cluster API, error-code taxonomy, cancellation, async build, observability.

Reference coverage mirrored here: tests/ut/test_error_code.cc (status codes
from bad configs / binary sets), test_context.cc (OpContext cancellation),
test_tracer.cc + test_prometheus.cc (observability smoke), and the Cluster
facade (src/cluster/cluster.cc Train/Assign semantics).
"""

from __future__ import annotations

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.comp import BloomFilter, OpContext
from knowhere_tpu.utils import metrics as _metrics
from knowhere_tpu.utils import tracing as _tracing

from .utils import gen_dataset


# ---------------------------------------------------------------------------
# Cluster (standalone k-means)
# ---------------------------------------------------------------------------


class TestCluster:
    def test_train_and_assign(self, rng):
        x = np.concatenate(
            [
                rng.standard_normal((200, 16), dtype=np.float32) + 8.0,
                rng.standard_normal((200, 16), dtype=np.float32) - 8.0,
            ]
        )
        ds = kt.GenDataSetFromArray(x)
        cl = kt.ClusterFactory.Instance().Create("KMEANS").value()
        res = cl.Train(ds, {"num_clusters": 2, "num_iter": 10})
        assert res.has_value(), res.what()
        cents = np.asarray(res.value().tensor).reshape(2, 16)
        assert cents.shape == (2, 16)
        # the two modes must be separated
        assert abs(cents[0, 0] - cents[1, 0]) > 4.0

        assign = cl.Assign(ds)
        assert assign.has_value()
        ids = np.asarray(assign.value().ids)
        assert ids.shape == (400,)
        # rows in one mode share an assignment; the modes differ
        assert len(set(ids[:200].tolist())) == 1
        assert len(set(ids[200:].tolist())) == 1
        assert ids[0] != ids[200]

    def test_assign_before_train(self):
        cl = kt.ClusterFactory.Instance().Create("KMEANS").value()
        res = cl.Assign(gen_dataset(10, 8))
        assert not res.has_value()
        assert res.error() == kt.Status.empty_index

    def test_retrain_with_different_params_rejected(self):
        cl = kt.ClusterFactory.Instance().Create("KMEANS").value()
        ds = gen_dataset(100, 8)
        assert cl.Train(ds, {"num_clusters": 4}).has_value()
        res = cl.Train(ds, {"num_clusters": 8})
        assert not res.has_value()
        assert res.error() == kt.Status.cluster_inner_error

    def test_default_num_clusters(self):
        # num_clusters defaults to 48 (reference kmeans_config.h set_default(48))
        cl = kt.ClusterFactory.Instance().Create("KMEANS").value()
        res = cl.Train(gen_dataset(100, 8), {})
        assert res.has_value(), res.what()
        assert np.asarray(res.value().tensor).reshape(-1, 8).shape[0] == 48

    def test_num_clusters_out_of_range(self):
        cl = kt.ClusterFactory.Instance().Create("KMEANS").value()
        res = cl.Train(gen_dataset(50, 8), {"num_clusters": 0})
        assert not res.has_value()
        assert res.error() == kt.Status.out_of_range_in_json

    def test_unknown_cluster_type(self):
        res = kt.ClusterFactory.Instance().Create("NOT_A_CLUSTER")
        assert not res.has_value()
        assert res.error() == kt.Status.invalid_cluster_error

    def test_type_name(self):
        cl = kt.ClusterFactory.Instance().Create("KMEANS").value()
        assert cl.Type() == "KMEANS"


# ---------------------------------------------------------------------------
# Error-code taxonomy (reference test_error_code.cc / test_config.cc slices)
# ---------------------------------------------------------------------------


class TestErrorCodes:
    def test_unknown_index_name(self):
        res = kt.IndexFactory.Instance().Create("NOT_AN_INDEX")
        assert not res.has_value()
        assert res.error() == kt.Status.invalid_index_error

    def test_out_of_range_param(self):
        idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
        st = idx.Build(gen_dataset(100, 16), {"metric_type": "L2", "nlist": 0})
        assert st == kt.Status.out_of_range_in_json

    def test_type_conflict_param(self):
        idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
        st = idx.Build(gen_dataset(100, 16), {"metric_type": "L2", "nlist": "many"})
        assert st == kt.Status.type_conflict_in_json

    def test_search_before_build(self):
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        res = idx.Search(gen_dataset(4, 16), {"metric_type": "L2", "k": 3})
        assert not res.has_value()
        assert res.error() == kt.Status.empty_index

    def test_bitset_size_mismatch(self):
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        assert idx.Build(gen_dataset(100, 16), {"metric_type": "L2"}) == kt.Status.success
        wrong = kt.BitsetView.from_bool_array(np.zeros(42, dtype=bool))
        res = idx.Search(gen_dataset(4, 16), {"metric_type": "L2", "k": 3}, bitset=wrong)
        assert not res.has_value()
        assert res.error() == kt.Status.invalid_args

    def test_deserialize_empty_binary_set(self):
        idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
        st = idx.Deserialize(kt.BinarySet(), {})
        assert st == kt.Status.invalid_binary_set

    def test_deserialize_wrong_family_blob(self):
        src = kt.IndexFactory.Instance().Create("FLAT").value()
        assert src.Build(gen_dataset(50, 8), {"metric_type": "L2"}) == kt.Status.success
        bs = kt.BinarySet()
        assert src.Serialize(bs) == kt.Status.success
        dst = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
        st = dst.Deserialize(bs, {})
        assert st in (
            kt.Status.invalid_binary_set,
            kt.Status.invalid_serialized_index_type,
        )

    def test_invalid_metric_for_index(self):
        idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
        st = idx.Build(gen_dataset(100, 16), {"metric_type": "HAMMING"})
        assert st != kt.Status.success

    def test_status_categories_exhaustive(self):
        # every status code maps to a category (reference expected.h:63-120
        # compile-time exhaustive switch -> runtime exhaustiveness here)
        from knowhere_tpu.status import StatusCategory, status_category_of

        for st in kt.Status:
            assert status_category_of(st) in StatusCategory
        assert status_category_of(kt.Status.success) == StatusCategory.success
        assert status_category_of(kt.Status.invalid_args) == StatusCategory.input_error
        assert status_category_of(kt.Status.timeout) == StatusCategory.transient_error


# ---------------------------------------------------------------------------
# Cancellation + async build (reference test_context.cc, interrupt.h)
# ---------------------------------------------------------------------------


class TestCancellationAndAsync:
    def test_cancelled_search_returns_timeout(self):
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        assert idx.Build(gen_dataset(200, 16), {"metric_type": "L2"}) == kt.Status.success
        ctx = OpContext()
        ctx.cancel()
        res = idx.Search(gen_dataset(4, 16), {"metric_type": "L2", "k": 3}, op_context=ctx)
        assert not res.has_value()
        assert res.error() == kt.Status.timeout

    def test_uncancelled_context_passes(self):
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        assert idx.Build(gen_dataset(200, 16), {"metric_type": "L2"}) == kt.Status.success
        res = idx.Search(
            gen_dataset(4, 16), {"metric_type": "L2", "k": 3}, op_context=OpContext()
        )
        assert res.has_value()

    @pytest.mark.parametrize("name,cfg", [
        ("FLAT", {"metric_type": "L2"}),
        ("IVF_FLAT", {"metric_type": "L2", "nlist": 8}),
        ("HNSW", {"metric_type": "L2", "M": 8, "efConstruction": 40}),
    ])
    def test_mid_search_cancellation_aborts(self, name, cfg):
        """A cancel arriving AFTER dispatch must abort the search at the next
        chunk boundary (reference checks inside per-query tasks, ivf.cc:962).
        The flip-token passes the facade's entry check, then reports cancelled
        at every later chunk-boundary check."""

        class _FlipToken:
            def __init__(self):
                self.calls = 0

            def is_cancellation_requested(self):
                self.calls += 1
                return self.calls > 1

        idx = kt.IndexFactory.Instance().Create(name).value()
        assert idx.Build(gen_dataset(3000, 16), cfg) == kt.Status.success
        ctx = OpContext()
        ctx.cancellation_token = _FlipToken()
        res = idx.Search(gen_dataset(8, 16), {"metric_type": "L2", "k": 3}, op_context=ctx)
        assert not res.has_value()
        assert res.error() == kt.Status.timeout
        assert ctx.cancellation_token.calls >= 2  # a mid-search check fired

    def test_mid_range_search_cancellation_aborts(self):
        class _FlipToken:
            def __init__(self):
                self.calls = 0

            def is_cancellation_requested(self):
                self.calls += 1
                return self.calls > 1

        idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
        assert idx.Build(gen_dataset(3000, 16), {"metric_type": "L2", "nlist": 8}) == kt.Status.success
        ctx = OpContext()
        ctx.cancellation_token = _FlipToken()
        res = idx.RangeSearch(
            gen_dataset(4, 16), {"metric_type": "L2", "radius": 1e9}, op_context=ctx
        )
        assert not res.has_value()
        assert res.error() == kt.Status.timeout

    def test_build_async_interrupt(self):
        idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
        interrupt = idx.BuildAsync(gen_dataset(500, 16), {"metric_type": "L2", "nlist": 8})
        st = interrupt.Get(timeout=120)
        assert st == kt.Status.success
        assert not interrupt.IsStopped()
        res = idx.Search(gen_dataset(4, 16), {"metric_type": "L2", "k": 3, "nprobe": 8})
        assert res.has_value()


# ---------------------------------------------------------------------------
# Observability smoke (reference test_tracer.cc / test_prometheus.cc)
# ---------------------------------------------------------------------------


class TestObservability:
    def test_search_records_latency_metric(self):
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        assert idx.Build(gen_dataset(100, 16), {"metric_type": "L2"}) == kt.Status.success
        before = _metrics.get_observation_count("knowhere_search_latency_seconds", "FLAT")
        assert idx.Search(gen_dataset(4, 16), {"metric_type": "L2", "k": 3}).has_value()
        after = _metrics.get_observation_count("knowhere_search_latency_seconds", "FLAT")
        assert after == before + 1

    def test_span_log_records_search(self):
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        assert idx.Build(gen_dataset(100, 16), {"metric_type": "L2"}) == kt.Status.success
        _tracing.get_span_log().clear()
        assert idx.Search(gen_dataset(4, 16), {"metric_type": "L2", "k": 3}).has_value()
        log = _tracing.get_span_log()
        assert any(e.get("name") == "knowhere_search" for e in log)

    def test_trace_ids_accepted_in_config(self):
        # legacy config-carried trace context (reference tracer.h:62-67)
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        assert idx.Build(gen_dataset(100, 16), {"metric_type": "L2"}) == kt.Status.success
        res = idx.Search(
            gen_dataset(2, 16),
            {"metric_type": "L2", "k": 3, "trace_id": "00ff", "span_id": "01", "trace_flags": 1},
        )
        assert res.has_value()

    def test_time_recorder(self):
        tr = _tracing.TimeRecorder("unit")
        assert tr.elapsed() >= 0.0
        assert tr.record("step") >= 0.0


# ---------------------------------------------------------------------------
# Misc comp (bloom filter)
# ---------------------------------------------------------------------------


class TestBloomFilter:
    def test_membership(self):
        bf = BloomFilter(1000, 0.01)
        for i in range(100):
            bf.add(f"key-{i}")
        assert all(f"key-{i}" in bf for i in range(100))
        fp = sum(1 for i in range(1000, 2000) if f"key-{i}" in bf)
        assert fp < 100  # ~1% expected
