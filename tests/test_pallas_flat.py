"""Two-phase exact flat scan (ops/pallas_flat) — interpret-mode oracle tests.

The kernel's exactness argument: top-k groups by group max provably cover the
global top-k (see module docstring). These tests check recall == 1.0 against
a numpy oracle across metrics, corpus sizes (padding edges), and k regimes,
plus the packing round-trip. The real-TPU lowering is exercised by
/verify and the benchmark suite.
"""

import numpy as np
import jax
import pytest

from knowhere_tpu.ops.pallas_flat import FlatScanStore, flat_topk, GROUP, TILE

rng = np.random.default_rng(7)


def _oracle(xq, xb, k, is_l2):
    d = ((xq[:, None] - xb[None]) ** 2).sum(-1) if is_l2 else -(xq @ xb.T)
    return np.argsort(d, axis=1, kind="stable")[:, :k], d


@pytest.mark.parametrize(
    "nb,nq,k,metric",
    [
        (6000, 37, 10, "L2"),       # corpus not a TILE/GROUP multiple
        (6000, 300, 100, "L2"),     # k > groups-per-remainder edge
        (4096, 8, 10, "IP"),        # exact TILE multiple
        (2048, 5, 150, "L2"),       # k > n_groups: selection covers ALL groups
        (2048 + GROUP + 3, 4, 33, "IP"),  # ragged tail group
    ],
)
def test_exact_vs_oracle(nb, nq, k, metric):
    xb = rng.standard_normal((nb, 96), dtype=np.float32)
    xq = rng.standard_normal((nq, 96), dtype=np.float32)
    is_l2 = metric == "L2"
    store = FlatScanStore(jax.device_put(xb), None, is_l2)
    dists, ids = flat_topk(xq, store, k, interpret=True)
    gt, gd = _oracle(xq, xb, k, is_l2)
    kk = min(k, nb)
    for r in range(nq):
        assert set(ids[r, :kk].tolist()) == set(gt[r, :kk].tolist())
        # distances in native convention and sorted best-first
        if is_l2:
            np.testing.assert_allclose(
                np.sort(dists[r, :kk]), np.sort(gd[r, gt[r, :kk]]), rtol=2e-4, atol=1e-2
            )
        assert np.all(ids[r, kk:] == -1)


def test_duplicate_rows_and_ties():
    # many identical rows: ties at the k-th value must still return k valid ids
    xb = np.ones((TILE + 100, 32), dtype=np.float32)
    xb[: TILE // 2] = 2.0
    xq = np.ones((3, 32), dtype=np.float32)
    store = FlatScanStore(jax.device_put(xb), None, True)
    dists, ids = flat_topk(xq, store, 20, interpret=True)
    assert (ids >= 0).all()
    # each row's ids unique
    for r in range(3):
        assert len(set(ids[r].tolist())) == 20


def test_k_larger_than_corpus():
    xb = rng.standard_normal((50, 16), dtype=np.float32)
    xq = rng.standard_normal((2, 16), dtype=np.float32)
    store = FlatScanStore(jax.device_put(xb), None, True)
    dists, ids = flat_topk(xq, store, 64, interpret=True)
    assert ids.shape == (2, 64)
    assert (ids[:, :50] >= 0).all()
    assert (ids[:, 50:] == -1).all()
    assert np.isinf(dists[:, 50:]).all()
