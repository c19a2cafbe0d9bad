"""Range-search window semantics across index families.

Reference model: tests/ut range-search coverage + range_util.h merge rules —
L2: results satisfy dist < radius, and with range_filter set, dist >=
range_filter (inner ring excluded); IP/COSINE (larger-is-closer): dist >
radius, and with range_filter set, dist <= range_filter. Results are CSR
(ids/distances/lims) and every reported distance obeys the window.
"""

import numpy as np
import pytest

import knowhere_tpu as kt
from .utils import gen_dataset

NB, NQ, DIM = 1200, 6, 32


@pytest.fixture(scope="module")
def base():
    return gen_dataset(NB, DIM, seed=101)


@pytest.fixture(scope="module")
def queries():
    return gen_dataset(NQ, DIM, seed=102)


FAMILIES = [
    ("FLAT", {}),
    ("IVF_FLAT", {"nlist": 16}),
    ("HNSW", {"M": 8, "efConstruction": 100}),
]


def build(name, base, tcfg, metric):
    idx = kt.IndexFactory.Instance().Create(name).value()
    st = idx.Build(base, {"metric_type": metric, **tcfg})
    assert st == kt.Status.success, st
    return idx


def unpack(res, nq):
    v = res.value()
    lims = np.asarray(v.lims, np.int64)
    ids = np.asarray(v.ids, np.int64)
    d = np.asarray(v.distance, np.float32)
    assert lims.shape == (nq + 1,)
    assert lims[-1] == len(ids) == len(d)
    return lims, ids, d


class TestRangeWindows:
    @pytest.mark.parametrize("name,tcfg", FAMILIES)
    def test_l2_one_sided(self, base, queries, name, tcfg):
        xb = np.asarray(base.tensor)
        xq = np.asarray(queries.tensor)
        med = float(np.median(((xq[0] - xb) ** 2).sum(1)))
        idx = build(name, base, tcfg, "L2")
        res = idx.RangeSearch(queries, {"metric_type": "L2", "radius": med})
        assert res.has_value(), res.what()
        lims, ids, d = unpack(res, NQ)
        assert (d < med + 1e-3).all()
        # distances are true L2^2 of the reported pairs
        for qi in range(NQ):
            sl = slice(lims[qi], lims[qi + 1])
            for i, dd in zip(ids[sl][:5], d[sl][:5]):
                np.testing.assert_allclose(dd, ((xq[qi] - xb[i]) ** 2).sum(), rtol=2e-3, atol=1e-2)

    @pytest.mark.parametrize("name,tcfg", FAMILIES)
    def test_l2_two_sided(self, base, queries, name, tcfg):
        xb = np.asarray(base.tensor)
        xq = np.asarray(queries.tensor)
        dall = ((xq[:, None] - xb[None]) ** 2).sum(-1)
        lo = float(np.quantile(dall, 0.1))
        hi = float(np.quantile(dall, 0.5))
        idx = build(name, base, tcfg, "L2")
        res = idx.RangeSearch(
            queries, {"metric_type": "L2", "radius": hi, "range_filter": lo}
        )
        assert res.has_value(), res.what()
        _, _, d = unpack(res, NQ)
        assert (d < hi + 1e-3).all() and (d >= lo - 1e-3).all(), (d.min(), d.max())

    @pytest.mark.parametrize("name,tcfg", FAMILIES)
    def test_ip_windows(self, base, queries, name, tcfg):
        xb = np.asarray(base.tensor)
        xq = np.asarray(queries.tensor)
        dall = xq @ xb.T
        lo = float(np.quantile(dall, 0.6))
        hi = float(np.quantile(dall, 0.95))
        idx = build(name, base, tcfg, "IP")
        res = idx.RangeSearch(queries, {"metric_type": "IP", "radius": lo})
        assert res.has_value(), res.what()
        _, _, d = unpack(res, NQ)
        assert (d > lo - 1e-3).all()
        res2 = idx.RangeSearch(
            queries, {"metric_type": "IP", "radius": lo, "range_filter": hi}
        )
        _, _, d2 = unpack(res2, NQ)
        assert (d2 > lo - 1e-3).all() and (d2 <= hi + 1e-3).all()

    def test_flat_exact_count(self, base, queries):
        """FLAT range search returns EXACTLY the in-window set."""
        xb = np.asarray(base.tensor)
        xq = np.asarray(queries.tensor)
        dall = ((xq[:, None] - xb[None]) ** 2).sum(-1)
        r = float(np.quantile(dall, 0.2))
        idx = build("FLAT", base, {}, "L2")
        res = idx.RangeSearch(queries, {"metric_type": "L2", "radius": r})
        lims, ids, _ = unpack(res, NQ)
        for qi in range(NQ):
            want = set(np.nonzero(dall[qi] < r)[0].tolist())
            got = set(ids[lims[qi] : lims[qi + 1]].tolist())
            assert got == want, f"q{qi}: missing {want - got}, extra {got - want}"

    def test_range_search_k_cap(self, base, queries):
        xb = np.asarray(base.tensor)
        xq = np.asarray(queries.tensor)
        dall = ((xq[:, None] - xb[None]) ** 2).sum(-1)
        r = float(np.quantile(dall, 0.5))
        idx = build("FLAT", base, {}, "L2")
        res = idx.RangeSearch(
            queries, {"metric_type": "L2", "radius": r, "range_search_k": 7}
        )
        lims, _, _ = unpack(res, NQ)
        assert (np.diff(lims) <= 7).all()

    def test_bitset_filtered_range(self, base, queries):
        filtered_mask = np.random.default_rng(11).random(NB) < 0.5
        bitset = kt.BitsetView.from_bool_array(filtered_mask)
        xb = np.asarray(base.tensor)
        xq = np.asarray(queries.tensor)
        dall = ((xq[:, None] - xb[None]) ** 2).sum(-1)
        r = float(np.quantile(dall, 0.3))
        idx = build("FLAT", base, {}, "L2")
        res = idx.RangeSearch(queries, {"metric_type": "L2", "radius": r}, bitset)
        lims, ids, _ = unpack(res, NQ)
        bad = set(ids.tolist()) & set(np.nonzero(filtered_mask)[0].tolist())
        assert not bad, f"filtered ids in range results: {sorted(bad)[:5]}"
