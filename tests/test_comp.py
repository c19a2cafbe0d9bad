"""Misc components: cancellation, bloom filter, rw lock, pools, generic FAISS
node, tracing/metrics smoke (reference coverage model: test_context.cc,
test_tracer.cc, test_prometheus.cc)."""

import threading
import time

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.comp import (
    BloomFilter,
    FairRWLock,
    OpContext,
    exec_over_search_pool,
    wait_all_success,
)
from knowhere_tpu.status import Status
from .utils import gen_dataset


class TestCancellation:
    def test_cancelled_search_returns_timeout(self):
        base = gen_dataset(100, 16)
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        idx.Build(base, {"metric_type": "L2"})
        ctx = OpContext()
        ctx.cancel()
        res = idx.Search(gen_dataset(2, 16), {"k": 3}, op_context=ctx)
        assert not res.has_value()
        assert res.error() == Status.timeout

    def test_uncancelled_passes(self):
        base = gen_dataset(100, 16)
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        idx.Build(base, {"metric_type": "L2"})
        res = idx.Search(gen_dataset(2, 16), {"k": 3}, op_context=OpContext())
        assert res.has_value()


class TestBloomFilter:
    def test_membership(self):
        bf = BloomFilter(1000, 0.01)
        for i in range(500):
            bf.add(f"key{i}")
        assert all(f"key{i}" in bf for i in range(500))
        fp = sum(1 for i in range(500, 1500) if f"key{i}" in bf)
        assert fp < 100  # fp rate sane


class TestRWLock:
    def test_concurrent_readers_exclusive_writer(self):
        lock = FairRWLock()
        state = {"readers": 0, "max_readers": 0, "writer_during_read": False}

        def reader():
            lock.acquire_read()
            state["readers"] += 1
            state["max_readers"] = max(state["max_readers"], state["readers"])
            time.sleep(0.01)
            state["readers"] -= 1
            lock.release_read()

        def writer():
            lock.acquire_write()
            if state["readers"]:
                state["writer_during_read"] = True
            time.sleep(0.01)
            lock.release_write()

        threads = [threading.Thread(target=reader) for _ in range(4)] + [
            threading.Thread(target=writer)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert state["max_readers"] >= 2
        assert not state["writer_during_read"]


class TestPools:
    def test_wait_all_success(self):
        futs = exec_over_search_pool([lambda: Status.success, lambda: Status.success])
        assert wait_all_success(futs) == Status.success
        futs = exec_over_search_pool([lambda: Status.success, lambda: Status.empty_index])
        assert wait_all_success(futs) == Status.empty_index


class TestFaissGenericNode:
    @pytest.mark.parametrize(
        "desc,scfg",
        [
            ("Flat", {}),
            ("IVF32,Flat", {"nprobe": 8}),
            ("IVF32,PQ8", {"nprobe": 16}),
            ("IVF32,SQ8", {"nprobe": 8}),
            ("HNSW16", {"ef": 64}),
        ],
    )
    def test_descriptions(self, desc, scfg):
        base = gen_dataset(1200, 64, seed=101)
        qs = gen_dataset(4, 64, seed=102)
        idx = kt.IndexFactory.Instance().Create("FAISS").value()
        st = idx.Build(base, {"metric_type": "L2", "index_description": desc})
        assert st == kt.Status.success, (desc, st)
        res = idx.Search(qs, {"metric_type": "L2", "k": 5, **scfg})
        assert res.has_value(), res.what()
        assert (res.value().ids >= 0).any()

    def test_bad_description(self):
        base = gen_dataset(100, 16)
        idx = kt.IndexFactory.Instance().Create("FAISS").value()
        st = idx.Build(base, {"metric_type": "L2", "index_description": "LSH,Whatever"})
        assert st == kt.Status.invalid_param_in_json

    def test_serialize_roundtrip(self):
        base = gen_dataset(500, 32, seed=103)
        qs = gen_dataset(3, 32, seed=104)
        idx = kt.IndexFactory.Instance().Create("FAISS").value()
        idx.Build(base, {"metric_type": "L2", "index_description": "IVF16,Flat"})
        binset = kt.BinarySet()
        assert idx.Serialize(binset) == kt.Status.success
        idx2 = kt.IndexFactory.Instance().Create("FAISS").value()
        assert idx2.Deserialize(binset) == kt.Status.success
        r1 = idx.Search(qs, {"metric_type": "L2", "k": 3, "nprobe": 16}).value()
        r2 = idx2.Search(qs, {"metric_type": "L2", "k": 3, "nprobe": 16}).value()
        np.testing.assert_array_equal(r1.ids, r2.ids)


class TestObservability:
    def test_span_log_records_searches(self):
        from knowhere_tpu.utils.tracing import get_span_log

        base = gen_dataset(100, 16)
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        idx.Build(base, {"metric_type": "L2"})
        idx.Search(gen_dataset(2, 16), {"k": 3, "trace_id": "abc123"})
        log = get_span_log()
        spans = [s for s in log if s["name"] == "knowhere_search" and s.get("trace_id") == "abc123"]
        assert spans and spans[-1]["k"] == 3

    def test_metrics_observed(self):
        import knowhere_tpu.utils.metrics as m

        base = gen_dataset(100, 16)
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        idx.Build(base, {"metric_type": "L2"})
        idx.Search(gen_dataset(2, 16), {"k": 3})
        if not m._HAS_PROM:
            assert m.get_fallback_observations("knowhere_search_latency_seconds", "FLAT")
