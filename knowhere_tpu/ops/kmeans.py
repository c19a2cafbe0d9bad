"""k-means (Lloyd) on the MXU — coarse-quantizer training for IVF + Cluster API.

Replaces faiss::Clustering as driven by the reference
(reference: src/index/ivf/ivf.cc:544-658 train path,
src/cluster/kmeans/faiss_kmeans.cc): random-sample init, Lloyd iterations with
empty-cluster reassignment, training-set subsampling
(max_points_per_centroid, faiss default 256/centroid). Assignments are always
exact argmin — one batched matmul per iteration (the TPU equivalent of
use_elkan's exactness without its branchy bookkeeping).

Compile-friendliness is deliberate: one jitted step function with a single
static shape per (n, k, d) — the training subsample is padded to its cap and
assignment chunks are padded to a fixed width, so repeated builds reuse the
same executable instead of paying XLA recompiles (first compile on this
platform costs minutes; the Lloyd loop itself is host-driven dispatches of the
same step).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

ASSIGN_CHUNK = 131072


@partial(jax.jit, static_argnames=())
def _assign_block(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """argmin_c |x - c|^2 for one block — one matmul + argmin."""
    dot = jax.lax.dot_general(
        x.astype(jnp.float32),
        centroids.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32,
    )
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=1)
    return jnp.argmin(c_sq[None, :] - 2.0 * dot, axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def _lloyd_step(x: jax.Array, centroids: jax.Array, *, k: int):
    """One Lloyd iteration: returns (new_centroids, counts)."""
    assign = _assign_block(x, centroids)
    x32 = x.astype(jnp.float32)
    sums = jax.ops.segment_sum(x32, assign, num_segments=k)
    counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32), assign, num_segments=k)
    new_c = sums / jnp.maximum(counts, 1.0)[:, None]
    new_c = jnp.where((counts == 0)[:, None], centroids, new_c)
    return new_c, counts


def kmeans(
    x: np.ndarray,
    k: int,
    n_iters: int = 12,
    seed: int = 1234,
    max_points_per_centroid: int = 256,
    chunk: int = ASSIGN_CHUNK,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full k-means: returns (centroids (k,d) f32, assignments (n,) i32)."""
    x = np.asarray(x)
    n, d = x.shape
    if k <= 0:
        raise ValueError("k must be positive")
    rng = np.random.default_rng(seed)

    # training subsample, padded to the cap so the step shape is stable
    cap = k * max_points_per_centroid
    if n > cap:
        train_idx = rng.choice(n, size=cap, replace=False)
        x_train = np.ascontiguousarray(x[train_idx], dtype=np.float32)
    else:
        x_train = np.asarray(x, dtype=np.float32)

    if x_train.shape[0] >= k:
        init_idx = rng.choice(x_train.shape[0], size=k, replace=False)
    else:
        init_idx = rng.choice(x_train.shape[0], size=k, replace=True)
    cents = jax.device_put(np.asarray(x_train[init_idx], dtype=np.float32))
    x_dev = jax.device_put(x_train)

    for _ in range(n_iters):
        cents, counts = _lloyd_step(x_dev, cents, k=k)
        counts_np = np.asarray(counts)
        # Route centroids through the host EVERY iteration so the step always
        # sees host-layout inputs: feeding the jit output straight back gives
        # it a device-chosen layout, which is a SECOND executable — and this
        # platform's compile of the scatter-heavy step took 648s (measured)
        # for that second layout. One 512KB d2h per iteration is ~30ms.
        cents_np = np.array(cents)  # copy: np.asarray of a jax array is read-only
        empty = counts_np == 0
        if empty.any():
            # reseed dead centroids from random training points (host-side;
            # the reference splits the largest cluster — same net effect)
            cents_np[empty] = x_train[rng.integers(0, x_train.shape[0], int(empty.sum()))]
        cents = jax.device_put(cents_np)

    centroids_np = np.asarray(cents, dtype=np.float32)
    assign_all = assign_rows(x, centroids_np, chunk=chunk)
    return centroids_np, assign_all


def assign_rows(x: np.ndarray, centroids: np.ndarray, chunk: int = ASSIGN_CHUNK) -> np.ndarray:
    """Assign every row of (host) x to its nearest centroid. Blocks are padded
    to a fixed width so only one executable per (chunk, k, d) exists."""
    x = np.asarray(x)
    n = x.shape[0]
    c_dev = jax.device_put(np.asarray(centroids, dtype=np.float32))
    chunk = min(chunk, max(_pow2_at_least(n), 16))
    out = np.empty(n, dtype=np.int32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        block = x[s:e].astype(np.float32, copy=False)
        if e - s < chunk:
            block = np.concatenate([block, np.zeros((chunk - (e - s), x.shape[1]), np.float32)])
        a = _assign_block(jax.device_put(block), c_dev)
        out[s:e] = np.asarray(a)[: e - s]
    return out


def _pow2_at_least(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


# Back-compat alias used by parallel/sharding tests
def assign_chunked(x, centroids, chunk: int = ASSIGN_CHUNK):  # noqa: ARG001
    return _assign_block(x, centroids)
