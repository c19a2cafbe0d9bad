"""mmap-backed loads across index families.

Reference coverage model: tests/ut/test_search.cc kMmapIndexPath paths —
Serialize to a file, DeserializeFromFile with enable_mmap, and verify search
results match the memory-deserialized index exactly (the reference routes
this through faiss IO_FLAG_MMAP, ivf.cc:1844-1903; here the sectioned format
is mmap-backed zero-copy by construction, io/serialize.py).
"""

import numpy as np
import pytest

import knowhere_tpu as kt

from .utils import gen_dataset

NB, NQ, DIM, K = 2000, 8, 32, 10

FAMILIES = [
    ("FLAT", {}),
    ("IVF_FLAT", {"nlist": 16}),
    ("IVF_SQ8", {"nlist": 16}),
    ("IVF_PQ", {"nlist": 16, "m": 8, "nbits": 8}),
    ("HNSW", {"M": 8, "efConstruction": 40}),
]


@pytest.mark.parametrize("name,build_cfg", FAMILIES, ids=[f[0] for f in FAMILIES])
def test_mmap_load_matches_memory_load(tmp_path, name, build_cfg):
    ds = gen_dataset(NB, DIM, seed=7)
    idx = kt.IndexFactory.Instance().Create(name).value()
    st = idx.Build(ds, {"metric_type": "L2", **build_cfg})
    assert st == kt.Status.success, st

    binset = kt.BinarySet()
    assert idx.Serialize(binset) == kt.Status.success
    blob = binset.GetByName(idx.node.Type())
    path = tmp_path / f"{name}.bin"
    path.write_bytes(bytes(blob.data))

    queries = kt.GenDataSetFromArray(np.asarray(ds.tensor)[:NQ])
    scfg = {"metric_type": "L2", "k": K}
    base = idx.Search(queries, scfg).value()

    mm = kt.IndexFactory.Instance().Create(name).value()
    st = mm.DeserializeFromFile(str(path), {"metric_type": "L2", "enable_mmap": True})
    assert st == kt.Status.success, st
    assert mm.Count() == NB and mm.Dim() == DIM
    res = mm.Search(queries, scfg).value()
    np.testing.assert_array_equal(res.ids, base.ids)
    np.testing.assert_allclose(res.distance, base.distance, rtol=1e-5, atol=1e-5)


def test_mmap_missing_file_is_disk_error():
    idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
    st = idx.DeserializeFromFile("/nonexistent/kt_mmap.bin", {"metric_type": "L2"})
    assert st == kt.Status.disk_file_error
