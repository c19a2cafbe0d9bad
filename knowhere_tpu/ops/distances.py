"""Pairwise distance kernels — the MXU replacement for the SIMD layer.

The reference dispatches hand-written AVX512/NEON/SVE kernels per metric and
dtype (reference: src/simd/hook.h:34-132, hook.cc:164-581, plus the faiss fork
knn_L2sqr/knn_inner_product/knn_cosine in
thirdparty/faiss/faiss/cppcontrib/knowhere/utils/distances.cpp). On TPU all of
those collapse into batched matrix products on the MXU:

- IP:      Q @ B^T                                  (one matmul)
- L2^2:    |q|^2 - 2 Q@B^T + |b|^2                  (same matmul + rank-1 adds)
- COSINE:  (Q@B^T) / (|q| |b|)                      (similarity, larger=better)
- HAMMING: bits unpacked to {0,1} int8; ham = |q| + |b| - 2 * Q@B^T
           (int8 matmul with int32 accumulation — exact)
- JACCARD: inter = Q@B^T ; dist = 1 - inter / (|q| + |b| - inter)
- SUB/SUPERSTRUCTURE: match iff inter == |q| (resp. |b|); ranked by
  (|q| - inter) resp. (|b| - inter) so exact matches sort first, parity with
  the reference's binary_knn_mc behavior (brute_force.cc:262-295).

Precision: `DistancePrecision.EXACT` forces fp32 HIGHEST-precision matmuls for
recall/distance parity with the CPU reference; `FAST` lets the MXU run native
bf16 passes (~6x faster on fp32 inputs) — selectable globally, the analog of
the reference's KnowhereConfig::SetSimdType.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index_param import metric as M


class DistancePrecision(enum.Enum):
    EXACT = "exact"  # full fp32 matmul (HIGHEST): bit-parity with CPU reference
    FAST = "fast"  # 3-pass bf16 (HIGH): ~fp32 accuracy at ~3x bf16 cost — the
    # production default; raw bf16 shifts top-k boundaries by ~0.4% and caps
    # recall below typical 0.95 targets (measured on SIFT-like data)
    BF16 = "bf16"  # single-pass bf16 (DEFAULT): max throughput, recall ceiling


_PRECISION = DistancePrecision.EXACT


def set_distance_precision(p: DistancePrecision) -> None:
    global _PRECISION
    _PRECISION = DistancePrecision(p)


def get_distance_precision() -> DistancePrecision:
    return _PRECISION


_PRECISION_MAP = {
    DistancePrecision.EXACT: jax.lax.Precision.HIGHEST,
    DistancePrecision.FAST: jax.lax.Precision.HIGH,
    DistancePrecision.BF16: jax.lax.Precision.DEFAULT,
}


def _matmul_precision():
    return _PRECISION_MAP[_PRECISION]


def matmul_precision_name() -> str:
    """Current precision as a hashable static-arg token for jitted kernels."""
    return _PRECISION.value


def precision_from_name(name: str):
    return _PRECISION_MAP[DistancePrecision(name)]


def pad_rows_ladder(a, minimum: int = 16):
    """Pad a (n, ...) batch to a shape ladder so jit shapes are reused:
    pow2 up to 8192, then multiples of 2048. Pure pow2 above 8k wastes real
    compute AND h2d bytes (a 10k batch padded to 16384 does 1.64x the work;
    measured 24.9k->~40k HNSW QPS on the 10k-query bench leg)."""
    import numpy as _np

    n = a.shape[0]
    if n <= 8192:
        p = minimum
        while p < n:
            p *= 2
    else:
        p = (n + 2047) // 2048 * 2048
    if p == n:
        return a
    pad_shape = (p - n,) + a.shape[1:]
    return _np.concatenate([a, _np.zeros(pad_shape, a.dtype)])


# ---------------------------------------------------------------------------
# Dense float metrics. Inputs may be fp32/fp16/bf16 (cast to fp32 compute) or
# int8 (exact int32 accumulation on the MXU).
# ---------------------------------------------------------------------------


def _dot(q: jax.Array, b: jax.Array) -> jax.Array:
    """(nq,d) x (nb,d) -> (nq,nb), fp32 result."""
    if q.dtype == jnp.int8 and b.dtype == jnp.int8:
        out = jax.lax.dot_general(
            q,
            b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return out.astype(jnp.float32)
    q32 = q.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    return jax.lax.dot_general(
        q32,
        b32,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=_matmul_precision(),
        preferred_element_type=jnp.float32,
    )


def ip_distance(q: jax.Array, b: jax.Array) -> jax.Array:
    """Inner product similarity (larger = better)."""
    return _dot(q, b)


def l2_sqr_distance(
    q: jax.Array, b: jax.Array, b_norms_sqr: jax.Array | None = None
) -> jax.Array:
    """Squared L2 (smaller = better). b_norms_sqr: optional precomputed |b|^2."""
    dot = _dot(q, b)
    qn = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    if b_norms_sqr is None:
        b_norms_sqr = jnp.sum(b.astype(jnp.float32) ** 2, axis=1)
    d = qn - 2.0 * dot + b_norms_sqr[None, :]
    return jnp.maximum(d, 0.0)


def cosine_distance(
    q: jax.Array, b: jax.Array, b_norms: jax.Array | None = None
) -> jax.Array:
    """Cosine similarity (larger = better), zero-norm-safe like the reference."""
    dot = _dot(q, b)
    qn = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True))
    if b_norms is None:
        b_norms = jnp.sqrt(jnp.sum(b.astype(jnp.float32) ** 2, axis=1))
    denom = jnp.where(qn == 0.0, 1.0, qn) * jnp.where(b_norms == 0.0, 1.0, b_norms)[None, :]
    return dot / denom


# ---------------------------------------------------------------------------
# Binary metrics over bit-unpacked {0,1} int8 planes.
# ---------------------------------------------------------------------------


def unpack_bits_host(packed: np.ndarray, dim_bits: int) -> np.ndarray:
    """(rows, dim_bits/8) uint8 -> (rows, dim_bits) int8 in {0,1}.

    LSB-first to match the reference/faiss bit order (bitsetview.h packing).
    Done once at build/query prep; the MXU then treats bits as int8 features.
    """
    packed = np.asarray(packed, dtype=np.uint8)
    rows = packed.shape[0]
    bits = np.unpackbits(packed.reshape(rows, -1), axis=1, bitorder="little")
    return bits[:, :dim_bits].astype(np.int8)


def binary_inter(q_bits: jax.Array, b_bits: jax.Array) -> jax.Array:
    """popcount(q & b) via int8 matmul (exact int32 accumulation)."""
    return jax.lax.dot_general(
        q_bits,
        b_bits,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def hamming_distance(q_bits: jax.Array, b_bits: jax.Array, b_pop: jax.Array | None = None) -> jax.Array:
    inter = binary_inter(q_bits, b_bits)
    q_pop = jnp.sum(q_bits.astype(jnp.int32), axis=1, keepdims=True)
    if b_pop is None:
        b_pop = jnp.sum(b_bits.astype(jnp.int32), axis=1)
    return (q_pop + b_pop[None, :] - 2 * inter).astype(jnp.float32)


def jaccard_distance(q_bits: jax.Array, b_bits: jax.Array, b_pop: jax.Array | None = None) -> jax.Array:
    inter = binary_inter(q_bits, b_bits).astype(jnp.float32)
    q_pop = jnp.sum(q_bits.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
    if b_pop is None:
        b_pop = jnp.sum(b_bits.astype(jnp.int32), axis=1)
    union = q_pop + b_pop[None, :].astype(jnp.float32) - inter
    return jnp.where(union == 0.0, 0.0, 1.0 - inter / union)


def substructure_distance(q_bits: jax.Array, b_bits: jax.Array, b_pop=None) -> jax.Array:
    """popcount(q & ~b): 0 iff q is a substructure (subset) of b."""
    inter = binary_inter(q_bits, b_bits)
    q_pop = jnp.sum(q_bits.astype(jnp.int32), axis=1, keepdims=True)
    return (q_pop - inter).astype(jnp.float32)


def superstructure_distance(q_bits: jax.Array, b_bits: jax.Array, b_pop: jax.Array | None = None) -> jax.Array:
    """popcount(~q & b): 0 iff q is a superstructure (superset) of b."""
    inter = binary_inter(q_bits, b_bits)
    if b_pop is None:
        b_pop = jnp.sum(b_bits.astype(jnp.int32), axis=1)
    return (b_pop[None, :] - inter).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Metric dispatch
# ---------------------------------------------------------------------------

# metric name -> (tile_fn(q, b, precomp), larger_is_better)
# `precomp` is the per-base auxiliary vector (|b|^2, |b|, popcount(b)) or None.
_DENSE = {
    M.L2: (l2_sqr_distance, False),
    M.IP: (lambda q, b, aux=None: ip_distance(q, b), True),
    M.COSINE: (cosine_distance, True),
}

_BINARY = {
    M.HAMMING: (hamming_distance, False),
    M.JACCARD: (jaccard_distance, False),
    M.SUBSTRUCTURE: (substructure_distance, False),
    M.SUPERSTRUCTURE: (superstructure_distance, False),
}


def is_binary_metric(metric_name: str) -> bool:
    return metric_name.upper() in _BINARY


def larger_is_better(metric_name: str) -> bool:
    m = metric_name.upper()
    if m in _DENSE:
        return _DENSE[m][1]
    if m in _BINARY:
        return _BINARY[m][1]
    raise ValueError(f"unknown metric {metric_name}")


def pairwise_distance(metric_name: str, q: jax.Array, b: jax.Array, aux: jax.Array | None = None) -> jax.Array:
    """(nq,d) x (nb,d) -> (nq,nb) distances/similarities for one tile.

    For binary metrics, q/b must already be bit-unpacked {0,1} int8 planes.
    `aux` is the precomputed per-row base auxiliary (see `base_aux`).
    """
    m = metric_name.upper()
    if m == M.IP:
        return ip_distance(q, b)
    if m == M.L2:
        return l2_sqr_distance(q, b, aux)
    if m == M.COSINE:
        return cosine_distance(q, b, aux)
    if m in _BINARY:
        return _BINARY[m][0](q, b, aux)
    raise ValueError(f"unknown metric {metric_name}")


def base_aux(metric_name: str, b: jax.Array) -> jax.Array | None:
    """Precompute the per-base-row auxiliary used by `pairwise_distance`.

    |b|^2 for L2, |b| for COSINE, popcount for binary metrics; computed once at
    build time so the search loop is a single matmul + elementwise epilogue.
    """
    m = metric_name.upper()
    if m == M.L2:
        return jnp.sum(b.astype(jnp.float32) ** 2, axis=1)
    if m == M.COSINE:
        return jnp.sqrt(jnp.sum(b.astype(jnp.float32) ** 2, axis=1))
    if m in (M.HAMMING, M.JACCARD, M.SUPERSTRUCTURE):
        return jnp.sum(b.astype(jnp.int32), axis=1)
    return None
