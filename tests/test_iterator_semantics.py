"""Iterator ordering/refine semantics across families.

Reference model: tests/ut/test_iterator.cc (744 LoC) — iterators must yield
results whose quality is (weakly) non-increasing, respect bitset filters, and
accept `retain_iterator_order` / `iterator_refine_ratio` (BaseConfig, stage I).
Our batched iterators precompute refined distances, so ordering is exact even
when retain_iterator_order is false — a strictly stronger guarantee; these
tests pin it.
"""

import numpy as np
import pytest

import knowhere_tpu as kt
from .utils import brute_force_gt, gen_bitset, gen_dataset, knn_recall

NB, NQ, DIM = 1500, 4, 48


@pytest.fixture(scope="module")
def base():
    return gen_dataset(NB, DIM, seed=81)


@pytest.fixture(scope="module")
def queries():
    return gen_dataset(NQ, DIM, seed=82)


CASES = [
    ("FLAT", {}, {}),
    ("IVF_FLAT", {"nlist": 16}, {"nprobe": 8}),
    ("IVF_PQ", {"nlist": 16, "m": 8}, {"nprobe": 8}),
    ("HNSW", {"M": 16, "efConstruction": 120}, {}),
    ("SCANN", {"nlist": 16, "with_raw_data": True}, {"nprobe": 8}),
]


def build(name, base, tcfg, metric="L2"):
    idx = kt.IndexFactory.Instance().Create(name).value()
    st = idx.Build(base, {"metric_type": metric, **tcfg})
    assert st == kt.Status.success, f"{name}: {st}"
    return idx


def drain(it, n):
    out = []
    while it.HasNext() and len(out) < n:
        out.append(it.Next())
    return out


class TestIteratorSemantics:
    @pytest.mark.parametrize("name,tcfg,scfg", CASES)
    @pytest.mark.parametrize("metric", ["L2", "IP"])
    def test_order_monotone(self, base, queries, name, tcfg, scfg, metric):
        idx = build(name, base, tcfg, metric)
        res = idx.AnnIterator(queries, {"metric_type": metric, **scfg}, kt.BitsetView())
        assert res.has_value(), res.what()
        for it in res.value():
            got = drain(it, 50)
            assert len(got) >= 10
            d = [x[1] for x in got]
            if metric == "L2":
                assert all(d[i] <= d[i + 1] + 1e-4 for i in range(len(d) - 1)), d[:10]
            else:
                assert all(d[i] >= d[i + 1] - 1e-4 for i in range(len(d) - 1)), d[:10]

    @pytest.mark.parametrize("name,tcfg,scfg", CASES)
    def test_iterator_recall_floor(self, base, queries, name, tcfg, scfg):
        """First k iterator hits meet the reference ANN recall floor (0.6) vs
        exact ground truth (reference kKnnRecallThreshold, test_search.cc:13)."""
        idx = build(name, base, tcfg)
        k = 10
        gt_ids, _ = brute_force_gt(base, queries, "L2", k)
        res_it = idx.AnnIterator(queries, {"metric_type": "L2", **scfg}, kt.BitsetView())
        got = np.full((NQ, k), -1, np.int64)
        for qi, it in enumerate(res_it.value()):
            hits = [x[0] for x in drain(it, k)]
            got[qi, : len(hits)] = hits
        rec = knn_recall(gt_ids, got, NQ, k)
        # raw-ADC iterators (PQ without raw data) stream unrefined order —
        # the reference's iterator is likewise unrefined there (no raw
        # store to refine with), so the search floor does not apply
        floor = 0.4 if name == "IVF_PQ" else 0.6
        assert rec >= floor, f"{name} iterator recall {rec}"

    @pytest.mark.parametrize("name,tcfg,scfg", CASES[:4])
    def test_knobs_accepted(self, base, queries, name, tcfg, scfg):
        idx = build(name, base, tcfg)
        res = idx.AnnIterator(
            queries,
            {"metric_type": "L2", "retain_iterator_order": True, "iterator_refine_ratio": 0.5, **scfg},
            kt.BitsetView(),
        )
        assert res.has_value(), res.what()
        got = drain(res.value()[0], 20)
        d = [x[1] for x in got]
        assert all(d[i] <= d[i + 1] + 1e-4 for i in range(len(d) - 1))

    def test_bitset_respected(self, base, queries):
        idx = build("HNSW", base, {"M": 16, "efConstruction": 120})
        # same construction as gen_bitset(NB, 0.5, seed=3)
        filtered_mask = np.random.default_rng(3).random(NB) < 0.5
        bitset = kt.BitsetView.from_bool_array(filtered_mask)
        filtered = set(np.nonzero(filtered_mask)[0].tolist())
        res = idx.AnnIterator(queries, {"metric_type": "L2"}, bitset)
        for it in res.value():
            got = [x[0] for x in drain(it, 40)]
            assert not (set(got) & filtered), "filtered-out ids surfaced by iterator"

    def test_iterator_exhaustion_on_tiny_corpus(self):
        xb = gen_dataset(32, DIM, seed=5)
        idx = build("FLAT", xb, {})
        res = idx.AnnIterator(gen_dataset(1, DIM, seed=6), {"metric_type": "L2"}, kt.BitsetView())
        it = res.value()[0]
        got = drain(it, 100)
        assert len(got) == 32
        assert not it.HasNext()
        assert len(set(x[0] for x in got)) == 32, "duplicates in exhaustive stream"
