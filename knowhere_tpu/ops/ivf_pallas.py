"""Pallas IVF list-scan kernel — block-aligned lists, scalar-prefetch DMA.

The XLA task scan (ops/ivf_scan._scan_chunk) lowers its vmapped
dynamic-slices to a gather that streams at ~15 GB/s on this platform — 50x
off HBM speed-of-light. This kernel replaces it for the hot raw-vector case:
lists are stored padded to LIST_ALIGN-row multiples (models/ivf.py), so each
task's rows are ONE aligned (B, d) block whose index is known before the
body runs (scalar-prefetched `blk`), letting Pallas double-buffer the HBM
DMAs across grid steps (reference analog: the faiss IVF scan_codes innermost
SIMD loop, thirdparty/faiss/.../IndexIVF.cpp).

Per grid step (one task = one list block x one <=Qg query group):
  - gather the Qg query rows from the VMEM-resident query table (qids are
    scalar-prefetched; Mosaic lowers per-row dynamic VMEM reads)
  - dots on the MXU: single-pass bf16, or 3-pass bf16 (hi/lo split == XLA
    Precision.HIGH, fp32-class ranking) for the FAST precision mode
  - L2 norms computed in-kernel from the f32 rows (a separate (B,) norms
    stream would need an un-tileable 1-wide block)
  - top-kk via kk passes of (max, leftmost-argmax, mask) on the VPU
    (Mosaic does not lower sort/top_k)

Platform notes (measured):
  - explicit precision= on dot crashes the axon AOT compiler -> hi/lo split
  - every device sync costs ~30ms flat after the process's first d2h; this
    kernel is called inside the async chain and never syncs
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # pltpu only lowers on TPU
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e38

# lists are padded to multiples of this many rows when built large enough
# (models/ivf.py LIST_ALIGN == this value; serialization keeps true lengths)
LIST_ALIGN = 512

# query table must fit VMEM next to the double-buffered (B, d) blocks
_Q_VMEM_BYTES = 8 * 1024 * 1024

_ON_TPU: Optional[bool] = None


def _on_tpu() -> bool:
    """Mosaic kernels only lower on TPU backends (the axon PJRT plugin
    reports TPU device kinds under its own platform name)."""
    global _ON_TPU
    if _ON_TPU is None:
        try:
            d = jax.devices()[0]
            tag = (getattr(d, "platform", "") + " " + getattr(d, "device_kind", "")).lower()
            _ON_TPU = "tpu" in tag
        except Exception:
            _ON_TPU = False
    return _ON_TPU


def _topk_rows(scores, payload, k: int):
    """(R, C) scores + i32 payload -> (R, k) best values + payloads via k
    passes of (max, leftmost argmax, mask). Payload extraction is a masked
    sum — Mosaic does not lower take_along_axis."""
    R, C = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    vals, pays, cur = [], [], scores
    for _ in range(k):
        m = jnp.max(cur, axis=1, keepdims=True)
        is_max = cur == m
        arg = jnp.min(jnp.where(is_max, col, C), axis=1, keepdims=True)
        hit = col == arg
        pays.append(jnp.sum(jnp.where(hit, payload, 0), axis=1, keepdims=True))
        vals.append(m)
        cur = jnp.where(hit, NEG_INF, cur)
    return jnp.concatenate(vals, 1), jnp.concatenate(pays, 1).astype(jnp.int32)


def _scan_kernel(
    blk_ref,  # (Tc,) scalar prefetch: block index of each task
    nrow_ref,  # (Tc,) scalar prefetch: valid rows in the block
    qids_ref,  # (Tc*Qg,) scalar prefetch: query ids, -1 padded
    q_ref,  # (nq_pad, d) VMEM-resident query table
    rows_ref,  # (B, d) current list block
    out_s_ref,  # (1, Qg, kk)
    out_p_ref,  # (1, Qg, kk)
    qs_scratch,  # (Qg, d) VMEM
    *,
    B: int,
    Qg: int,
    kk: int,
    is_l2: bool,
    three_pass: bool,
):
    t = pl.program_id(0)
    for j in range(Qg):
        qid = jnp.maximum(qids_ref[t * Qg + j], 0)
        qs_scratch[pl.ds(j, 1), :] = q_ref[pl.ds(qid, 1), :]
    qs = qs_scratch[...]
    rows = rows_ref[...]

    if three_pass:
        # hi/lo bf16 split == XLA Precision.HIGH (fp32-class ranking); the
        # axon AOT compiler rejects explicit precision= on dot
        q_hi = qs.astype(jnp.bfloat16)
        q_lo = (qs - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        r_hi = rows.astype(jnp.bfloat16)
        r_lo = (rows - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        dots = (
            jax.lax.dot_general(q_hi, r_hi, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(q_hi, r_lo, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(q_lo, r_hi, dn, preferred_element_type=jnp.float32)
        )
    else:
        dots = jax.lax.dot_general(
            qs, rows, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    if is_l2:
        nrm = jnp.sum(rows * rows, axis=1)
        score = 2.0 * dots - nrm[None, :]
    else:
        score = dots

    col = jax.lax.broadcasted_iota(jnp.int32, (Qg, B), 1)
    score = jnp.where(col < nrow_ref[t], score, NEG_INF)
    gpos = col + blk_ref[t] * B
    s, p = _topk_rows(score, gpos, kk)
    out_s_ref[0] = s
    out_p_ref[0] = jnp.where(s <= NEG_INF / 2, -1, p)


@functools.partial(jax.jit, static_argnames=("B", "Qg", "kk", "is_l2", "three_pass"))
def pallas_scan_tasks(
    blk: jax.Array,  # (Tc,) int32
    nrows: jax.Array,  # (Tc,) int32
    qids_flat: jax.Array,  # (Tc*Qg,) int32
    q: jax.Array,  # (nq_pad, d) f32
    data: jax.Array,  # (nb_pad, d) f32, nb_pad % B == 0
    *,
    B: int,
    Qg: int,
    kk: int,
    is_l2: bool,
    three_pass: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scores (Tc,Qg,kk), positions (Tc,Qg,kk) into padded storage)."""
    Tc = blk.shape[0]
    nq_pad, d = q.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Tc,),
        in_specs=[
            pl.BlockSpec((nq_pad, d), lambda t, b, n, qd: (0, 0)),
            pl.BlockSpec((B, d), lambda t, b, n, qd: (b[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Qg, kk), lambda t, b, n, qd: (t, 0, 0)),
            pl.BlockSpec((1, Qg, kk), lambda t, b, n, qd: (t, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((Qg, d), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _scan_kernel, B=B, Qg=Qg, kk=kk, is_l2=is_l2, three_pass=three_pass
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tc, Qg, kk), jnp.float32),
            jax.ShapeDtypeStruct((Tc, Qg, kk), jnp.int32),
        ],
    )(blk, nrows, qids_flat, q, data)


def pallas_scan_available(
    kind: str,
    d: int,
    k: int,
    nq_pad: int,
    offsets: np.ndarray,
    has_mask: bool,
    is_jaccard: bool,
    prec: str,
) -> bool:
    """The kernel handles the hot raw-vector path; everything else falls back
    to the XLA task scan."""
    if not _HAS_PLTPU or os.environ.get("KNOWHERE_DISABLE_PALLAS_IVF") == "1":
        return False
    if not _on_tpu():
        return False
    if kind != "raw" or has_mask or is_jaccard:
        return False
    if prec not in ("fast", "bf16"):
        return False  # 'exact' keeps the fp32 XLA path
    if d % 128 != 0 or k > 32 or k < 1:
        return False
    if nq_pad * d * 4 > _Q_VMEM_BYTES:
        return False  # query table must stay VMEM-resident
    offsets = np.asarray(offsets)
    if offsets.size < 2 or offsets[-1] == 0:
        return False
    return bool((offsets % LIST_ALIGN == 0).all())
