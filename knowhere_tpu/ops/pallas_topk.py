"""Pallas fused scan: distance matmul + running top-k, entirely in VMEM.

The hand-written-kernel analog of the reference's innermost SIMD scan+heap
(reference: thirdparty/faiss/.../utils/distances.cpp knn_L2sqr +
faiss HeapArray): the XLA path (ops/topk.py) materializes each (nq, tile)
score block in HBM between the matmul and lax.top_k; this kernel keeps the
scores in VMEM and folds them into a running (nq, k) best list before the
next tile arrives — one HBM read of the base, zero intermediate traffic.

Kernel structure (TPU grid iterations are sequential, so VMEM scratch
persists across base tiles):

  grid = (nb // T,)
  step i: scores = 2 q @ tile_i^T - |tile_i|^2        (MXU)
          for j in range(k):  extract current max      (VPU, k passes)
          merge tile top-k with running top-k          (VPU)
  last step: write (nq, k) results

Top-k without sort: k passes of (max, argmax, mask-out) — exact, and cheap
for the small k of ANN serving (k*(T+2k) VPU ops per tile vs 2*d*T MXU flops).

This kernel is the optional fast path of ops/topk (enable with
KNOWHERE_USE_PALLAS=1 or use_pallas=True); the XLA path remains the default
and the correctness oracle.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # pltpu only lowers on TPU; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e38


def _topk_rows(scores, payload, k: int):
    """(nq, T) scores + int32 payload -> (nq, k) top values + payloads.

    k passes of (max, leftmost-argmax, mask). Payload extraction uses a
    masked reduction rather than a gather — Mosaic does not lower
    take_along_axis-style gathers inside kernels."""
    nq, T = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (nq, T), 1)
    vals = []
    pays = []
    cur = scores
    for _ in range(k):
        m = jnp.max(cur, axis=1, keepdims=True)  # (nq, 1)
        is_max = cur == m
        # leftmost argmax: smallest column index among maxima
        arg = jnp.min(jnp.where(is_max, col, T), axis=1, keepdims=True)
        hit = col == arg
        pay = jnp.sum(jnp.where(hit, payload, 0), axis=1, keepdims=True)
        vals.append(m)
        pays.append(pay)
        cur = jnp.where(hit, NEG_INF, cur)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(pays, axis=1).astype(jnp.int32)


def _fused_kernel(q_ref, base_ref, norms_ref, out_s_ref, out_i_ref, best_s, best_i, *, k: int, is_l2: bool, tile: int):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        best_s[:] = jnp.full_like(best_s, NEG_INF)
        best_i[:] = jnp.full_like(best_i, -1)

    q = q_ref[:]
    tile_rows = base_ref[:]
    # NOTE: Mosaic's dot lowering on this platform rejects explicit
    # precision= (AOT compiler crash); the kernel therefore runs the MXU's
    # native single-pass bf16 — same accuracy class as the BF16 precision
    # mode of the XLA path.
    dots = jax.lax.dot_general(
        q, tile_rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if is_l2:
        scores = 2.0 * dots - norms_ref[:][None, :]
    else:
        # IP: norms are zero for real rows; padding rows carry a huge norm so
        # they can never enter the top-k
        scores = dots - norms_ref[:][None, :]

    nq_, T_ = scores.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (nq_, T_), 1) + i * tile
    t_s, t_i = _topk_rows(scores, col_ids, k)

    # merge two sorted-descending k-lists with k max/mask passes over 2k cols
    cat_s = jnp.concatenate([best_s[:], t_s], axis=1)  # (nq, 2k)
    cat_i = jnp.concatenate([best_i[:], t_i], axis=1)
    m_s, m_i = _topk_rows(cat_s, cat_i, k)
    best_s[:] = m_s
    best_i[:] = m_i

    @pl.when(i == n_steps - 1)
    def _finish():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = jnp.where(best_s[:] <= NEG_INF / 2, -1, best_i[:])


@functools.partial(jax.jit, static_argnames=("k", "is_l2", "tile", "interpret"))
def fused_knn_scan(
    q: jax.Array,  # (nq, d) f32 — nq should be a multiple of 8
    base: jax.Array,  # (nb, d) f32, nb a multiple of tile
    norms: jax.Array,  # (nb,) f32 (|b|^2; zeros for IP)
    *,
    k: int,
    is_l2: bool,
    tile: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scores (nq,k) larger-is-better, ids (nq,k))."""
    nq, d = q.shape
    nb = base.shape[0]
    assert nb % tile == 0, "pad base to a tile multiple"
    grid = (nb // tile,)

    if not _HAS_PLTPU:
        raise NotImplementedError("pallas tpu backend unavailable")
    kwargs = {
        "scratch_shapes": [
            pltpu.VMEM((nq, k), jnp.float32),
            pltpu.VMEM((nq, k), jnp.int32),
        ]
    }
    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((tile,), lambda i: (i,), memory_space=vm),
    ]
    out_specs = [
        pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=vm),
    ]

    out_s, out_i = pl.pallas_call(
        functools.partial(_fused_kernel, k=k, is_l2=is_l2, tile=tile),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ],
        interpret=interpret,
        **kwargs,
    )(q, base, norms)
    return out_s, out_i


def pallas_knn(
    q: np.ndarray,
    base: jax.Array,
    k: int,
    metric: str,
    norms: Optional[jax.Array] = None,
    tile: int = 2048,
    interpret: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper: pads shapes, runs the fused kernel, returns numpy
    (dists native convention, ids int64)."""
    metric = metric.upper()
    is_l2 = metric == "L2"
    nb, d = base.shape
    if norms is None:
        norms = (
            jnp.sum(base.astype(jnp.float32) ** 2, axis=1)
            if is_l2
            else jnp.zeros((nb,), jnp.float32)
        )
    pad_rows = (-nb) % tile
    if pad_rows:
        base = jnp.concatenate([base, jnp.zeros((pad_rows, d), base.dtype)])
        # padded rows get a huge norm (L2) / contribute zero dot (IP) but must
        # also never win for IP: give them +huge norm either way and rely on
        # the id >= nb mask for IP
        norms = jnp.concatenate([norms, jnp.full((pad_rows,), 1e38, norms.dtype)])
    q = np.asarray(q, dtype=np.float32)
    nq = q.shape[0]
    # VMEM budget: the (nq_chunk, tile) score block + beam state must stay
    # inside ~16MB of VMEM. Each chunk re-streams the whole base from HBM, so
    # maximize queries per pass and shrink the tile instead.
    # the k-pass top-k holds several (q_chunk, tile) temporaries live at once,
    # so budget well under the 16MB VMEM limit (256x2048 measures stable on
    # v5e; smaller tiles currently crash the axon AOT compiler)
    budget_cells = 1 << 19
    q_chunk = max(8, min(256, budget_cells // tile))
    q_chunk = 1 << (q_chunk - 1).bit_length() if q_chunk & (q_chunk - 1) else q_chunk
    s_parts, i_parts = [], []
    for s0 in range(0, nq, q_chunk):
        e0 = min(s0 + q_chunk, nq)
        qc = q[s0:e0]
        pad_q = q_chunk - qc.shape[0]
        if pad_q:
            qc = np.concatenate([qc, np.zeros((pad_q, d), np.float32)])
        sc, ic = fused_knn_scan(
            jax.device_put(qc), base, norms, k=k, is_l2=is_l2, tile=tile, interpret=interpret
        )
        s_parts.append(np.asarray(sc)[: e0 - s0])
        i_parts.append(np.asarray(ic, dtype=np.int64)[: e0 - s0])
    s = np.concatenate(s_parts)
    i = np.concatenate(i_parts)
    i = np.where(i >= nb, -1, i)  # padded rows
    if is_l2:
        qsq = np.sum(q[:nq].astype(np.float64) ** 2, axis=1).astype(np.float32)
        dists = qsq[:, None] - s
    else:
        dists = s
    dists = np.where(i >= 0, dists, np.float32(np.inf if is_l2 else -np.inf))
    return dists, i
