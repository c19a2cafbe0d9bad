"""Multi-chip sharding layer on the virtual 8-device CPU mesh (SURVEY.md §4:
the TPU analog of multi-node tests; reference has none — single-node library)."""

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.parallel.sharding import (
    ShardedFlatIndex,
    make_mesh,
    replicate,
    shard_rows,
    sharded_kmeans,
    sharded_kmeans_step,
    sharded_search,
)
from .utils import brute_force_gt, gen_dataset, knn_recall

import jax


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(jax.devices()[:8])


NB, NQ, DIM, K = 1000, 10, 64, 10


class TestShardedSearch:
    def test_matches_single_chip_exact(self, mesh):
        base_ds = gen_dataset(NB, DIM, seed=21)
        query_ds = gen_dataset(NQ, DIM, seed=22)
        xb = np.asarray(base_ds.tensor)
        xq = np.asarray(query_ds.tensor)

        idx = ShardedFlatIndex(mesh, "L2")
        idx.build(xb)
        dists, ids = idx.search(xq, K)

        gt_ids, gt_dists = brute_force_gt(base_ds, query_ds, "L2", K)
        assert knn_recall(gt_ids, ids, NQ, K) >= 0.99
        np.testing.assert_allclose(np.sort(dists, 1), np.sort(gt_dists, 1), rtol=1e-3, atol=1e-3)

    def test_ip_metric(self, mesh):
        base_ds = gen_dataset(NB, DIM, seed=23)
        query_ds = gen_dataset(NQ, DIM, seed=24)
        idx = ShardedFlatIndex(mesh, "IP")
        idx.build(np.asarray(base_ds.tensor))
        _, ids = idx.search(np.asarray(query_ds.tensor), K)
        gt_ids, _ = brute_force_gt(base_ds, query_ds, "IP", K)
        assert knn_recall(gt_ids, ids, NQ, K) >= 0.99

    def test_filtered(self, mesh):
        base_ds = gen_dataset(NB, DIM, seed=25)
        query_ds = gen_dataset(NQ, DIM, seed=26)
        rng = np.random.default_rng(0)
        keep = rng.random(NB) > 0.5
        idx = ShardedFlatIndex(mesh, "L2")
        idx.build(np.asarray(base_ds.tensor))
        _, ids = idx.search(np.asarray(query_ds.tensor), K, bitset_keep=keep)
        for row in ids:
            for i in row:
                if i >= 0:
                    assert keep[i]

    def test_padding_rows_never_returned(self, mesh):
        # 1003 rows does not divide 8 — padding must be masked out
        base_ds = gen_dataset(1003, DIM, seed=27)
        query_ds = gen_dataset(NQ, DIM, seed=28)
        idx = ShardedFlatIndex(mesh, "L2")
        idx.build(np.asarray(base_ds.tensor))
        _, ids = idx.search(np.asarray(query_ds.tensor), K)
        assert ids.max() < 1003


class TestShardedKmeans:
    def test_step_matches_host_lloyd(self, mesh):
        rng = np.random.default_rng(31)
        x = rng.standard_normal((800, DIM)).astype(np.float32)
        init = x[:16].copy()
        base = shard_rows(mesh, x)
        cents = replicate(mesh, init)
        out = np.asarray(sharded_kmeans_step(mesh, base, cents))

        # host reference Lloyd step
        d = ((x[:, None, :] - init[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        want = init.copy()
        for c in range(16):
            sel = a == c
            if sel.any():
                want[c] = x[sel].mean(0)
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)

    def test_full_kmeans_converges(self, mesh):
        rng = np.random.default_rng(32)
        centers = rng.standard_normal((8, DIM)).astype(np.float32) * 10
        x = np.concatenate([c + rng.standard_normal((100, DIM)).astype(np.float32) for c in centers])
        cents = sharded_kmeans(mesh, x, k=8, n_iters=15, seed=1)
        # every true center should have a learned centroid nearby
        d = ((centers[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assert (d.min(1) < DIM * 0.5).all()


class TestShardedIVF:
    def test_matches_exact_at_full_probe(self, mesh):
        from knowhere_tpu.parallel.sharding import ShardedIVFIndex

        rng = np.random.default_rng(77)
        xb = rng.standard_normal((2000, 32)).astype(np.float32)
        xq = rng.standard_normal((8, 32)).astype(np.float32)
        idx = ShardedIVFIndex(devices=jax.devices()[:4], metric="L2")
        idx.build(xb, nlist=32)
        dists, ids = idx.search(xq, k=5, nprobe=32)
        d = ((xq[:, None, :].astype(np.float64) - xb[None]) ** 2).sum(-1)
        gt = np.argsort(d, 1, kind="stable")[:, :5]
        from .utils import knn_recall

        assert knn_recall(gt, ids, 8, 5) >= 0.99

    def test_partial_probe_recall(self, mesh):
        from knowhere_tpu.parallel.sharding import ShardedIVFIndex
        from .utils import knn_recall

        rng = np.random.default_rng(78)
        xb = rng.standard_normal((2000, 32)).astype(np.float32)
        xq = xb[:8] + 0.01 * rng.standard_normal((8, 32)).astype(np.float32)
        idx = ShardedIVFIndex(devices=jax.devices()[:4], metric="L2")
        idx.build(xb, nlist=32)
        _, ids = idx.search(xq, k=5, nprobe=8)
        assert (ids[:, 0] == np.arange(8)).mean() >= 0.9

    @pytest.mark.parametrize("variant,m", [("sq8", 0), ("pq", 8)])
    def test_quantized_variants(self, mesh, variant, m):
        """Sharded IVF with global codecs (SQ8 / PQ-ADC) on per-device lists."""
        from knowhere_tpu.parallel.sharding import ShardedIVFIndex

        rng = np.random.default_rng(79)
        xb = rng.standard_normal((2000, 32)).astype(np.float32)
        xq = xb[:8] + 0.01 * rng.standard_normal((8, 32)).astype(np.float32)
        idx = ShardedIVFIndex(devices=jax.devices()[:4], metric="L2")
        idx.build(xb, nlist=32, variant=variant, m=m)
        _, ids = idx.search(xq, k=5, nprobe=32)
        # quantization noise tolerated: the true row must appear in top-5
        assert np.mean([(ids[i] == i).any() for i in range(8)]) >= 0.85


class TestShardedGraph:
    def test_recall_vs_bruteforce(self, mesh):
        from knowhere_tpu.parallel.sharding import ShardedGraphIndex
        from .utils import knn_recall

        rng = np.random.default_rng(80)
        xb = rng.standard_normal((2000, 32)).astype(np.float32)
        xq = rng.standard_normal((16, 32)).astype(np.float32)
        idx = ShardedGraphIndex(devices=jax.devices()[:4], metric="L2")
        idx.build(xb, M=16, ef_construction=100)
        dists, ids = idx.search(xq, k=10, ef=64)
        d = ((xq[:, None, :].astype(np.float64) - xb[None]) ** 2).sum(-1)
        gt = np.argsort(d, 1, kind="stable")[:, :10]
        assert knn_recall(gt, ids, 16, 10) >= 0.8
        # distances are true L2^2 for returned ids
        row = ids[0, 0]
        np.testing.assert_allclose(
            dists[0, 0], ((xq[0] - xb[row]) ** 2).sum(), rtol=1e-3, atol=1e-3
        )

    def test_ip_metric(self, mesh):
        from knowhere_tpu.parallel.sharding import ShardedGraphIndex
        from .utils import knn_recall

        rng = np.random.default_rng(81)
        xb = rng.standard_normal((1500, 32)).astype(np.float32)
        xq = rng.standard_normal((8, 32)).astype(np.float32)
        idx = ShardedGraphIndex(devices=jax.devices()[:3], metric="IP")
        idx.build(xb, M=16)
        _, ids = idx.search(xq, k=10, ef=64)
        gt = np.argsort(-(xq @ xb.T), 1, kind="stable")[:, :10]
        assert knn_recall(gt, ids, 8, 10) >= 0.8

    def test_inline_fast_path(self, mesh, monkeypatch):
        """Forced per-shard inline tables (ops/graph_inline.py) return the
        same-quality results as the general per-shard walk."""
        from knowhere_tpu.parallel.sharding import ShardedGraphIndex
        from .utils import knn_recall

        monkeypatch.setenv("KNOWHERE_GRAPH_INLINE", "1")
        rng = np.random.default_rng(82)
        xb = rng.standard_normal((2000, 32)).astype(np.float32)
        xq = rng.standard_normal((16, 32)).astype(np.float32)
        idx = ShardedGraphIndex(devices=jax.devices()[:4], metric="L2")
        idx.build(xb, M=16, ef_construction=100)
        assert all("inline" in sh for sh in idx._shards), "inline must be forced on"
        dists, ids = idx.search(xq, k=10, ef=64)
        d = ((xq[:, None, :].astype(np.float64) - xb[None]) ** 2).sum(-1)
        gt = np.argsort(d, 1, kind="stable")[:, :10]
        assert knn_recall(gt, ids, 16, 10) >= 0.8
        row = ids[0, 0]
        np.testing.assert_allclose(
            dists[0, 0], ((xq[0] - xb[row]) ** 2).sum(), rtol=1e-3, atol=1e-3
        )

    def test_inline_4bit_fast_path(self, mesh, monkeypatch):
        from knowhere_tpu.parallel.sharding import ShardedGraphIndex
        from .utils import knn_recall

        monkeypatch.setenv("KNOWHERE_GRAPH_INLINE", "1")
        monkeypatch.setenv("KNOWHERE_INLINE_BITS", "4")
        rng = np.random.default_rng(83)
        xb = rng.standard_normal((2000, 32)).astype(np.float32)
        xq = rng.standard_normal((16, 32)).astype(np.float32)
        idx = ShardedGraphIndex(devices=jax.devices()[:4], metric="L2")
        idx.build(xb, M=16, ef_construction=100)
        assert all(sh.get("inline") is not None and sh["inline"].bits == 4 for sh in idx._shards)
        _, ids = idx.search(xq, k=10, ef=64)
        d = ((xq[:, None, :].astype(np.float64) - xb[None]) ** 2).sum(-1)
        gt = np.argsort(d, 1, kind="stable")[:, :10]
        assert knn_recall(gt, ids, 16, 10) >= 0.8
