"""k-means (Lloyd) on the MXU — coarse-quantizer training for IVF + Cluster API.

Replaces faiss::Clustering as driven by the reference
(reference: src/index/ivf/ivf.cc:544-658 train path,
src/cluster/kmeans/faiss_kmeans.cc): random-sample init, Lloyd iterations with
empty-cluster reassignment, training-set subsampling
(max_points_per_centroid), and Elkan-style exactness (assignments here are
always exact argmin, computed as one batched matmul per iteration — the TPU
equivalent of use_elkan=true's exactness without its branchy bookkeeping).

Design: one Lloyd iteration = assign (tiled L2 argmin over the MXU) +
update (segment-sum via one-hot matmul, which is itself MXU work for
k <= a few thousand, else scatter-add). The whole loop is jittable;
the data-parallel multi-chip variant (psum over per-shard partial sums)
lives in parallel/sharding.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("chunk",))
def assign_chunked(x: jax.Array, centroids: jax.Array, chunk: int = 65536) -> jax.Array:
    """Exact nearest-centroid assignment: argmin_c |x - c|^2, tiled over rows."""
    n = x.shape[0]
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=1)

    def one_chunk(xc):
        dot = jax.lax.dot_general(
            xc.astype(jnp.float32),
            centroids.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # |x|^2 is constant per row for the argmin — skip it
        return jnp.argmin(c_sq[None, :] - 2.0 * dot, axis=1).astype(jnp.int32)

    n_full = n // chunk
    out = []
    if n_full > 0:
        xs = x[: n_full * chunk].reshape(n_full, chunk, x.shape[1])
        assigned = jax.lax.map(one_chunk, xs)
        out.append(assigned.reshape(-1))
    if n - n_full * chunk > 0:
        out.append(one_chunk(x[n_full * chunk :]))
    return jnp.concatenate(out) if len(out) > 1 else out[0]


def _update_centroids(x: jax.Array, assign: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """segment-sum + counts. Uses scatter-add (XLA lowers this efficiently)."""
    sums = jax.ops.segment_sum(x.astype(jnp.float32), assign, num_segments=k)
    counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32), assign, num_segments=k)
    return sums, counts


@partial(jax.jit, static_argnames=("k", "n_iters", "chunk"))
def _lloyd(
    x: jax.Array, init_centroids: jax.Array, seed: jax.Array, *, k: int, n_iters: int, chunk: int
) -> Tuple[jax.Array, jax.Array]:
    n = x.shape[0]

    def body(i, carry):
        centroids, key = carry
        assign = assign_chunked(x, centroids, chunk=chunk)
        sums, counts = _update_centroids(x, assign, k)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty-cluster repair (faiss splits the largest cluster; here each
        # empty centroid is re-seeded from a random training point — same
        # effect: no dead centroids, refreshed every iteration).
        key, sub = jax.random.split(key)
        rand_idx = jax.random.randint(sub, (k,), 0, n)
        rand_pts = x[rand_idx].astype(jnp.float32)
        empty = (counts == 0)[:, None]
        new_c = jnp.where(empty, rand_pts, new_c)
        return new_c, key

    key0 = jax.random.PRNGKey(seed[0]) if seed.ndim else jax.random.PRNGKey(seed)
    centroids, _ = jax.lax.fori_loop(0, n_iters, body, (init_centroids.astype(jnp.float32), key0))
    final_assign = assign_chunked(x, centroids, chunk=chunk)
    return centroids, final_assign


def kmeans(
    x: np.ndarray,
    k: int,
    n_iters: int = 12,
    seed: int = 1234,
    max_points_per_centroid: int = 256,
    chunk: int = 65536,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full k-means: returns (centroids (k,d) f32, assignments (n,) i32).

    Subsamples the training set to k*max_points_per_centroid rows (faiss
    default 256/centroid) for the Lloyd loop, then assigns ALL rows with the
    final centroids.
    """
    x = np.asarray(x)
    n, d = x.shape
    if k <= 0:
        raise ValueError("k must be positive")
    rng = np.random.default_rng(seed)

    # training subsample
    cap = k * max_points_per_centroid
    if n > cap:
        train_idx = rng.choice(n, size=cap, replace=False)
        x_train = x[train_idx]
    else:
        x_train = x

    # init: k distinct random training points (pad by sampling w/ replacement
    # when fewer rows than centroids, mirroring faiss's tolerant behavior)
    if x_train.shape[0] >= k:
        init_idx = rng.choice(x_train.shape[0], size=k, replace=False)
    else:
        init_idx = rng.choice(x_train.shape[0], size=k, replace=True)
    init = np.asarray(x_train[init_idx], dtype=np.float32)

    x_dev = jax.device_put(x_train)
    centroids, _ = _lloyd(
        x_dev,
        jax.device_put(init),
        jnp.asarray([seed], dtype=jnp.uint32),
        k=k,
        n_iters=n_iters,
        chunk=min(chunk, max(x_train.shape[0], 1)),
    )
    centroids_np = np.asarray(centroids, dtype=np.float32)

    # final assignment of the FULL dataset (chunked on host to bound memory)
    assign_all = assign_rows(x, centroids_np, chunk=chunk)
    return centroids_np, assign_all


def assign_rows(x: np.ndarray, centroids: np.ndarray, chunk: int = 262144) -> np.ndarray:
    """Assign every row of (host) x to its nearest centroid."""
    x = np.asarray(x)
    c_dev = jax.device_put(np.asarray(centroids, dtype=np.float32))
    out = np.empty(x.shape[0], dtype=np.int32)
    for s in range(0, x.shape[0], chunk):
        e = min(s + chunk, x.shape[0])
        a = assign_chunked(jax.device_put(x[s:e]), c_dev, chunk=min(65536, e - s))
        out[s:e] = np.asarray(a)
    return out
