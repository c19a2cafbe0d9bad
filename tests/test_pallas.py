"""Pallas fused scan kernel vs numpy oracle (interpret mode on the CPU mesh;
the TPU-compiled path is exercised by bench/verify runs on hardware)."""

import numpy as np
import pytest

import jax

from knowhere_tpu.ops.pallas_topk import pallas_knn


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    xb = rng.standard_normal((4096 + 100, 64)).astype(np.float32)  # ragged vs tile
    xq = rng.standard_normal((10, 64)).astype(np.float32)
    return xb, xq


class TestPallasFusedScan:
    def test_l2_exact(self, data):
        xb, xq = data
        d, i = pallas_knn(xq, jax.device_put(xb), 10, "L2", tile=1024, interpret=True)
        gt_d = ((xq[:, None].astype(np.float64) - xb[None]) ** 2).sum(-1)
        gt = np.argsort(gt_d, 1, kind="stable")[:, :10]
        assert (i == gt).all()
        np.testing.assert_allclose(d, np.take_along_axis(gt_d, gt, 1), rtol=1e-3, atol=1e-3)

    def test_ip_exact(self, data):
        xb, xq = data
        d, i = pallas_knn(xq, jax.device_put(xb), 10, "IP", tile=1024, interpret=True)
        gt = np.argsort(-(xq.astype(np.float64) @ xb.T), 1, kind="stable")[:, :10]
        assert (i == gt).all()

    def test_k_larger_than_real_results(self, data):
        xb, xq = data
        small = xb[:5]
        d, i = pallas_knn(xq[:2], jax.device_put(small), 10, "L2", tile=1024, interpret=True)
        assert (i[:, 5:] == -1).all()
        assert (i[:, :5] >= 0).all()
