"""Refine pass — exact re-scoring of gathered candidates.

Replaces the reference's IndexRefine/refine_k machinery (reference:
thirdparty/faiss/.../IndexRefine.cpp + IndexScaNN.cpp reorder_k; refine_type
quantized stores per include/knowhere/comp/index_param.h RefineType). The
coarse index returns reorder_k/refine_k*k candidates; this pass gathers their
(raw or quantized) vectors and recomputes exact distances in one batched
matvec, then re-selects top-k.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .distances import matmul_precision_name as _prec_name


@dataclass
class RefineStore:
    """Device-side store for refine vectors: raw fp32/fp16/bf16/int8 rows or
    UINT8 (SQ8) codes with per-dim affine params."""

    kind: str  # 'raw' | 'sq8'
    data: jax.Array  # (nb, d) or (nb, d) uint8
    vmin: Optional[jax.Array] = None
    vdiff: Optional[jax.Array] = None


@partial(jax.jit, static_argnames=("k", "is_l2", "kind", "sq_levels", "prec"))
def _refine_kernel(
    q: jax.Array,  # (nq, d)
    data: jax.Array,
    vmin: Optional[jax.Array],
    vdiff: Optional[jax.Array],
    cand: jax.Array,  # (nq, R) int32, -1 padded
    *,
    k: int,
    is_l2: bool,
    kind: str,
    sq_levels: int,
    prec: str = "exact",
) -> Tuple[jax.Array, jax.Array]:
    from .distances import precision_from_name

    mp = precision_from_name(prec)
    vecs = jnp.take(data, jnp.clip(cand, 0), axis=0)  # (nq, R, d')
    if kind == "sq8":
        vecs = vmin[None, None, :] + (vecs.astype(jnp.float32) + 0.5) / sq_levels * vdiff[None, None, :]
    else:
        vecs = vecs.astype(jnp.float32)
    dots = jnp.einsum("qd,qrd->qr", q, vecs, preferred_element_type=jnp.float32, precision=mp)
    if is_l2:
        dist = jnp.sum(q**2, axis=1, keepdims=True) - 2.0 * dots + jnp.sum(vecs**2, axis=2)
        score = -dist
    else:
        score = dots
    score = jnp.where(cand >= 0, score, -jnp.inf)
    best_s, sel = jax.lax.top_k(score, k)
    best_i = jnp.take_along_axis(cand, sel, axis=1)
    best_i = jnp.where(best_s == -jnp.inf, -1, best_i)
    dist_out = -best_s if is_l2 else best_s
    return dist_out, best_i


def refine_topk_device(
    q_dev: jax.Array,
    store: RefineStore,
    cand_dev: jax.Array,  # (nq, R) int32 device, -1 padded
    k: int,
    is_l2: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Device-resident refine: no host sync (each sync costs ~30ms flat on
    this platform; callers chain and read back once)."""
    return _refine_kernel(
        q_dev,
        store.data,
        store.vmin,
        store.vdiff,
        cand_dev,
        k=k,
        is_l2=is_l2,
        kind=store.kind,
        sq_levels=256,
        prec=_prec_name(),
    )


def refine_topk(
    q_dev: jax.Array,
    store: RefineStore,
    cand_ids: np.ndarray,  # (nq, R) indices into store.data, -1 padded
    k: int,
    is_l2: bool,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (dists (nq,k) native convention, ids (nq,k) into store, -1 pad)."""
    dists, ids = refine_topk_device(
        q_dev, store, jax.device_put(np.asarray(cand_ids, dtype=np.int32)), k, is_l2
    )
    return np.asarray(dists), np.asarray(ids)
