"""Odd/large dimensionality coverage (GIST-960-style; dims not multiples of
the 128-lane TPU tile must still be exact — XLA pads internally)."""

import numpy as np
import pytest

import knowhere_tpu as kt
from .utils import brute_force_gt, gen_dataset, knn_recall


@pytest.mark.parametrize("dim", [50, 200, 960])
class TestOddDims:
    def test_flat_exact(self, dim):
        base = gen_dataset(500, dim, seed=dim)
        queries = gen_dataset(4, dim, seed=dim + 1)
        idx = kt.IndexFactory.Instance().Create("FLAT").value()
        assert idx.Build(base, {"metric_type": "L2"}) == kt.Status.success
        res = idx.Search(queries, {"metric_type": "L2", "k": 5})
        gt, _ = brute_force_gt(base, queries, "L2", 5)
        assert knn_recall(gt, res.value().ids, 4, 5) >= 0.95

    def test_ivf(self, dim):
        base = gen_dataset(800, dim, seed=dim + 2)
        queries = gen_dataset(4, dim, seed=dim + 3)
        idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
        assert idx.Build(base, {"metric_type": "L2", "nlist": 8}) == kt.Status.success
        res = idx.Search(queries, {"metric_type": "L2", "k": 5, "nprobe": 8})
        gt, _ = brute_force_gt(base, queries, "L2", 5)
        assert knn_recall(gt, res.value().ids, 4, 5) >= 0.95

    def test_pq_m_derivation(self, dim):
        # m must divide dim; the node derives/errors cleanly
        base = gen_dataset(800, dim, seed=dim + 4)
        idx = kt.IndexFactory.Instance().Create("IVF_PQ").value()
        m_ok = {50: 10, 200: 20, 960: 16}[dim]
        st = idx.Build(base, {"metric_type": "L2", "nlist": 8, "m": m_ok})
        assert st == kt.Status.success
        st_bad = kt.IndexFactory.Instance().Create("IVF_PQ").value().Build(
            base, {"metric_type": "L2", "nlist": 8, "m": 7 if dim != 50 else 9}
        )
        assert st_bad == kt.Status.invalid_args
