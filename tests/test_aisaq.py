"""AISAQ all-in-storage layout (models/diskann.AisaqIndexNode; reference
src/index/diskann/diskann_aisaq.cc): inline per-node records carrying
adjacency + own + neighbor PQ codes, served with no PQ resident in HBM."""

import os
import tempfile

import numpy as np
import pytest

import knowhere_tpu as kt

NB, NQ, DIM, K = 6000, 32, 64, 10


class _FM:
    def LoadFile(self, path):
        return True

    def AddFile(self, path):
        return os.path.exists(path)


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(0)
    xb = rng.standard_normal((NB, DIM)).astype(np.float32)
    xq = rng.standard_normal((NQ, DIM)).astype(np.float32)
    tmp = tempfile.mkdtemp(prefix="knowhere_aisaq_")
    data_path = os.path.join(tmp, "raw.bin")
    with open(data_path, "wb") as f:
        np.asarray(xb.shape, dtype=np.int32).tofile(f)
        xb.tofile(f)
    prefix = os.path.join(tmp, "idx")
    idx = kt.IndexFactory.Instance().Create("AISAQ", object=_FM()).value()
    st = idx.Build(kt.DataSet(), {
        "metric_type": "L2", "index_prefix": prefix, "data_path": data_path,
        "max_degree": 24, "search_list_size": 48,
        "pq_code_budget_gb": 16 * NB / 1e9,
        "build_dram_budget_gb": 4.0,
    })
    assert st.name == "success", st.name
    return xb, xq, prefix


def test_inline_layout_and_search(built):
    xb, xq, prefix = built
    assert os.path.exists(prefix + "_aisaq_inline.bin")
    idx = kt.IndexFactory.Instance().Create("AISAQ", object=_FM()).value()
    st = idx.Deserialize(kt.BinarySet(), {"metric_type": "L2", "index_prefix": prefix})
    assert st.name == "success", st.name
    node = idx.node
    assert node._inline_nodes is not None
    assert "codes" not in node._store  # the all-in-storage property
    deg, m = node._inline_geom
    assert node._inline_nodes.shape[1] == deg * 4 + m + deg * m

    bf = kt.BruteForce.Search(
        kt.GenDataSetFromArray(xb), kt.GenDataSetFromArray(xq),
        {"metric_type": "L2", "k": K},
    )
    gt = bf.value().ids.reshape(NQ, K)
    r = idx.Search(kt.GenDataSetFromArray(xq),
                   {"metric_type": "L2", "k": K, "search_list_size": 96})
    assert r.has_value(), r.what()
    ids = np.asarray(r.value().ids).reshape(NQ, K)
    rec = np.mean([
        len(set(gt[i].tolist()) & set(ids[i].tolist()) - {-1}) / K
        for i in range(NQ)
    ])
    assert rec >= 0.8, rec


def test_inline_filtered(built):
    xb, xq, prefix = built
    idx = kt.IndexFactory.Instance().Create("AISAQ", object=_FM()).value()
    assert idx.Deserialize(
        kt.BinarySet(), {"metric_type": "L2", "index_prefix": prefix}
    ).name == "success"
    # exclude the true NN of query 0 and check it disappears
    r0 = idx.Search(kt.GenDataSetFromArray(xq[:1]),
                    {"metric_type": "L2", "k": 1, "search_list_size": 64})
    top = int(np.asarray(r0.value().ids)[0])
    bits = np.zeros(NB, bool)
    bits[top] = True  # filtered OUT
    bs = kt.BitsetView(np.packbits(bits, bitorder="little"), NB)
    r1 = idx.Search(kt.GenDataSetFromArray(xq[:1]),
                    {"metric_type": "L2", "k": 5, "search_list_size": 64}, bs)
    assert r1.has_value(), r1.what()
    assert top not in np.asarray(r1.value().ids).tolist()


def test_inline_pq_false_keeps_plain_path():
    rng = np.random.default_rng(1)
    xb = rng.standard_normal((2000, 32)).astype(np.float32)
    tmp = tempfile.mkdtemp(prefix="knowhere_aisaq_off_")
    data_path = os.path.join(tmp, "raw.bin")
    with open(data_path, "wb") as f:
        np.asarray(xb.shape, dtype=np.int32).tofile(f)
        xb.tofile(f)
    prefix = os.path.join(tmp, "idx")
    idx = kt.IndexFactory.Instance().Create("AISAQ", object=_FM()).value()
    st = idx.Build(kt.DataSet(), {
        "metric_type": "L2", "index_prefix": prefix, "data_path": data_path,
        "max_degree": 16, "search_list_size": 32, "inline_pq": False,
        "pq_code_budget_gb": 8 * 2000 / 1e9, "build_dram_budget_gb": 4.0,
    })
    assert st.name == "success", st.name
    assert not os.path.exists(prefix + "_aisaq_inline.bin")
    idx2 = kt.IndexFactory.Instance().Create("AISAQ", object=_FM()).value()
    assert idx2.Deserialize(
        kt.BinarySet(),
        {"metric_type": "L2", "index_prefix": prefix, "inline_pq": False},
    ).name == "success"
    assert idx2.node._inline_nodes is None
    assert "codes" in idx2.node._store
    r = idx2.Search(kt.GenDataSetFromArray(xb[:4]),
                    {"metric_type": "L2", "k": 3, "search_list_size": 32})
    assert r.has_value(), r.what()
