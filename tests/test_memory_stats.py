"""MemoryStats accounting (index_node.py) + host-payload spill (utils/spill).

BASELINE.md north star: 'equal recall at equal memory' — these tests pin that
(a) every family reports host/device bytes and bytes_per_vector, (b) spilled
payloads are classified as mmap (not resident host RAM), and (c) spilling
changes no results."""

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.utils import spill

NB, NQ, DIM, K = 4000, 8, 64, 5


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    xb = rng.standard_normal((NB, DIM), dtype=np.float32)
    return xb, xb[:NQ].copy()


@pytest.mark.parametrize("name,cfg", [
    ("FLAT", {}),
    ("IVF_FLAT", {"nlist": 16}),
    ("IVF_PQ", {"nlist": 8, "m": 8}),
    ("HNSW", {"M": 8, "efConstruction": 40}),
])
def test_memory_stats_reports(name, cfg, data):
    xb, xq = data
    idx = kt.IndexFactory.Instance().Create(name).value()
    assert idx.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2", **cfg}) == kt.Status.success
    idx.Search(kt.GenDataSetFromArray(xq), {"metric_type": "L2", "k": K}, kt.BitsetView())
    st = idx.node.MemoryStats()
    assert st["device_bytes"] > 0, st
    assert st["bytes_per_vector"] > 0
    if name in ("FLAT", "IVF_FLAT", "HNSW"):
        # raw stores hold the corpus at >= 1 byte/dim on device
        assert st["device_bytes"] >= NB * DIM
    else:
        # quantized: device codes must be SMALLER than the fp32 corpus
        assert st["device_bytes"] < NB * DIM * 4


def test_spill_array_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("KNOWHERE_SPILL_DIR", str(tmp_path))
    monkeypatch.setenv("KNOWHERE_HOST_SPILL_THRESHOLD", "1024")
    a = np.arange(100_000, dtype=np.float32).reshape(1000, 100)
    sp = spill.spill_array(a)
    assert isinstance(sp, np.memmap)
    np.testing.assert_array_equal(np.asarray(sp), a)
    spill.release_spill(sp)
    small = np.zeros(4, np.float32)
    assert spill.spill_array(small) is small  # below threshold


def test_spilled_index_results_identical(tmp_path, monkeypatch, data):
    monkeypatch.setenv("KNOWHERE_SPILL_DIR", str(tmp_path))
    monkeypatch.setenv("KNOWHERE_HOST_SPILL_THRESHOLD", "1024")  # force spill
    xb, xq = data

    def run(name, cfg, scfg):
        idx = kt.IndexFactory.Instance().Create(name).value()
        assert idx.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2", **cfg}) == kt.Status.success
        r = idx.Search(kt.GenDataSetFromArray(xq), {"metric_type": "L2", "k": K, **scfg}, kt.BitsetView())
        st = idx.node.MemoryStats()
        # serialize still works off the memmap
        bs = kt.BinarySet()
        assert idx.Serialize(bs) == kt.Status.success
        return r.value().ids, st

    ids_sp, st_sp = run("IVF_FLAT", {"nlist": 16}, {"nprobe": 16})
    monkeypatch.setenv("KNOWHERE_HOST_SPILL", "0")
    ids_ns, st_ns = run("IVF_FLAT", {"nlist": 16}, {"nprobe": 16})
    np.testing.assert_array_equal(np.asarray(ids_sp), np.asarray(ids_ns))
    assert st_sp["mmap_bytes"] > 0
    assert st_sp["host_bytes"] < st_ns["host_bytes"]


def test_spilled_get_vector_by_ids(tmp_path, monkeypatch, data):
    monkeypatch.setenv("KNOWHERE_SPILL_DIR", str(tmp_path))
    monkeypatch.setenv("KNOWHERE_HOST_SPILL_THRESHOLD", "1024")
    xb, _ = data
    idx = kt.IndexFactory.Instance().Create("HNSW").value()
    assert idx.Build(
        kt.GenDataSetFromArray(xb), {"metric_type": "L2", "M": 8, "efConstruction": 40}
    ) == kt.Status.success
    ids = np.array([0, 7, 1999], dtype=np.int64)
    r = idx.GetVectorByIds(kt.GenIdsDataSet(ids))
    assert r.has_value(), r.what()
    got = np.asarray(r.value().tensor).reshape(len(ids), DIM)
    np.testing.assert_allclose(got, xb[ids], rtol=1e-6)
