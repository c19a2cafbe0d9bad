"""IVF list-scan engine — batched (query-group x list-block) matmul tasks.

Replaces the reference's per-query inverted-list scan
(reference: thirdparty/faiss/.../IndexIVF.cpp scan_codes driven from
src/index/ivf/ivf.cc:955-1210: coarse top-nprobe, then per-query per-list
code scans with LUT/SIMD kernels and IDSelector filtering).

TPU-first design. A per-query pointer walk wastes the MXU, and per-query
gathers re-read each list once per query. Instead the (query, probed-list)
pairs of a batch are INVERTED on the host into dense tasks:

    task = (one block of <=B consecutive rows of one list,
            one group of <=Qg queries probing that list)

so every task is a dense (Qg x B x d) matmul — each list block is read once
per query GROUP (not per query), and all compute lands on the MXU. Results
are merged per query by scattering each task's per-query top-k into a slot
matrix and running one final top-k. Lists are stored contiguously
(sorted-by-list layout with a CSR offset table), so block gathers are
contiguous dynamic slices, the layout mmaps cleanly, and bitset filters are
pre-sorted once per search.

Codecs (kind): 'raw' (fp32/fp16/bf16/int8), 'pq' (decode-on-the-fly, ==ADC),
'sq' (SQ4/SQ6/SQ8/FP16/BF16 affine decode), 'rabitq' (sign-plane estimator).
"""

from __future__ import annotations

import os

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -float("inf")


# ---------------------------------------------------------------------------
# Host-side task scheduler
# ---------------------------------------------------------------------------


@dataclass
class TaskBatch:
    row_start: np.ndarray  # (T,) int32 — first row of the block (sorted storage)
    nrows: np.ndarray  # (T,) int32 — valid rows in the block (<= B)
    list_id: np.ndarray  # (T,) int32
    qids: np.ndarray  # (T, Qg) int32, -1 padded
    slots: np.ndarray  # (T, Qg) int32 — per-query merge slot
    n_slots: int  # S = max slots over queries
    B: int
    Qg: int


def build_scan_tasks(
    probes: np.ndarray,
    list_offsets: np.ndarray,
    B: int,
    Qg: int,
    list_lengths: Optional[np.ndarray] = None,
) -> Optional[TaskBatch]:
    """Invert (query -> probed lists) into (list-block x query-group) tasks.

    `probes` is (nq, nprobe) int32 (entries may be -1 = padding). Fully
    vectorized — O(nq*nprobe) numpy with no Python per-list loops, so the
    host scheduler stays off the critical path even at nq=10k x nprobe=256.

    `list_lengths` carries TRUE list lengths when the storage is block-
    aligned (lists padded to LIST_ALIGN multiples); offsets then give padded
    starts while nrows masking comes from the true lengths.
    """
    nq, _ = probes.shape
    list_offsets = np.asarray(list_offsets, dtype=np.int64)
    flat_l = probes.reshape(-1).astype(np.int64)
    flat_q = np.repeat(np.arange(nq, dtype=np.int32), probes.shape[1])
    lens_all = (
        np.asarray(list_lengths, dtype=np.int64)
        if list_lengths is not None
        else np.diff(list_offsets)
    )
    valid = flat_l >= 0
    valid &= np.where(valid, lens_all[np.clip(flat_l, 0, None)] > 0, False)
    flat_l, flat_q = flat_l[valid], flat_q[valid]
    if flat_l.size == 0:
        return None

    order = np.argsort(flat_l, kind="stable")
    sl, sq = flat_l[order], flat_q[order]
    P = sl.size

    # per-pair list geometry
    pair_len = lens_all[sl]
    pair_blocks = ((pair_len + B - 1) // B).astype(np.int32)

    # rank of each pair within its list group -> (group g, column)
    lchange = np.empty(P, bool)
    lchange[0] = True
    lchange[1:] = sl[1:] != sl[:-1]
    lstart = np.nonzero(lchange)[0]
    lgrp = np.cumsum(lchange) - 1
    rank = np.arange(P) - lstart[lgrp]
    g = rank // Qg
    col = (rank % Qg).astype(np.int64)

    # pair-group id: contiguous runs of (list, g)
    gchange = lchange | np.concatenate([[True], g[1:] != g[:-1]])
    pg = np.cumsum(gchange) - 1  # (P,) pair-group index
    G = int(pg[-1]) + 1
    pg_start = np.nonzero(gchange)[0]
    group_list = sl[pg_start]
    group_blocks = pair_blocks[pg_start].astype(np.int64)

    # per-query slot base: exclusive cumsum of pair_blocks in query order
    qorder = np.argsort(sq, kind="stable")
    blocks_q = pair_blocks[qorder].astype(np.int64)
    csum = np.cumsum(blocks_q)
    excl = csum - blocks_q
    sq_sorted = sq[qorder]
    qchange = np.empty(P, bool)
    qchange[0] = True
    qchange[1:] = sq_sorted[1:] != sq_sorted[:-1]
    qgrp_start = np.nonzero(qchange)[0]
    qgrp = np.cumsum(qchange) - 1
    excl -= excl[qgrp_start][qgrp]
    slot_base = np.empty(P, np.int64)
    slot_base[qorder] = excl
    totals = np.bincount(sq, weights=pair_blocks.astype(np.float64), minlength=nq)
    n_slots = int(totals.max())

    # scatter pairs into (G, Qg) member matrices
    qids_g = np.full((G, Qg), -1, np.int32)
    slots_g = np.zeros((G, Qg), np.int32)
    qids_g[pg, col] = sq
    slots_g[pg, col] = slot_base.astype(np.int32)

    # expand pair-groups into per-block tasks
    T = int(group_blocks.sum())
    task_group = np.repeat(np.arange(G, dtype=np.int64), group_blocks)
    gb_excl = np.cumsum(group_blocks) - group_blocks
    task_b = (np.arange(T, dtype=np.int64) - gb_excl[task_group]).astype(np.int64)
    task_list = group_list[task_group]
    lo = list_offsets[task_list]
    row_start = (lo + task_b * B).astype(np.int32)
    nrows = np.minimum(B, lens_all[task_list] - task_b * B).astype(np.int32)

    task_qids = qids_g[task_group]
    task_slots = slots_g[task_group] + task_b[:, None].astype(np.int32)

    return TaskBatch(
        row_start=row_start,
        nrows=nrows,
        list_id=task_list.astype(np.int32),
        qids=task_qids,
        slots=task_slots,
        n_slots=n_slots,
        B=B,
        Qg=Qg,
    )


def build_full_scan_tasks(
    nq: int,
    list_offsets: np.ndarray,
    B: int,
    Qg: int,
    list_lengths: Optional[np.ndarray] = None,
) -> Optional[TaskBatch]:
    """TaskBatch for nprobe == nlist (every query scans every list).

    The generic inverter (build_scan_tasks) costs an O(nq*nlist) argsort the
    full-probe case doesn't need: the layout is deterministic — every block
    is scanned by every ceil(nq/Qg) query group, and a query's merge slot for
    a block is just the global block index. High-dim corpora live in this
    regime (GIST-960 needs nprobe ~ 0.75*nlist for recall 0.95), where this
    path also lets the caller skip the coarse probe entirely."""
    list_offsets = np.asarray(list_offsets, dtype=np.int64)
    lens = (
        np.asarray(list_lengths, dtype=np.int64)
        if list_lengths is not None
        else np.diff(list_offsets)
    )
    sel = np.nonzero(lens > 0)[0]
    if sel.size == 0 or nq == 0:
        return None
    bl = ((lens[sel] + B - 1) // B).astype(np.int64)
    nb_blocks = int(bl.sum())
    bexcl = np.cumsum(bl) - bl
    blk_list = np.repeat(sel, bl)
    tb = np.arange(nb_blocks, dtype=np.int64) - np.repeat(bexcl, bl)
    row_start_b = (list_offsets[blk_list] + tb * B).astype(np.int32)
    nrows_b = np.minimum(B, lens[blk_list] - tb * B).astype(np.int32)

    NG = (nq + Qg - 1) // Qg
    qids_g = np.full((NG, Qg), -1, np.int32)
    flat = np.arange(NG * Qg, dtype=np.int32)
    qids_g.reshape(-1)[...] = np.where(flat < nq, flat, -1)

    T = nb_blocks * NG
    row_start = np.tile(row_start_b, NG)
    nrows = np.tile(nrows_b, NG)
    list_id = np.tile(blk_list.astype(np.int32), NG)
    qids = np.repeat(qids_g, nb_blocks, axis=0)
    slot_b = np.arange(nb_blocks, dtype=np.int32)
    slots = np.tile(slot_b, NG)[:, None] + np.zeros((1, Qg), np.int32)
    return TaskBatch(
        row_start=row_start,
        nrows=nrows,
        list_id=list_id,
        qids=qids,
        slots=slots,
        n_slots=nb_blocks,
        B=B,
        Qg=Qg,
    )


def _build_tasks(probes, nq, list_offsets, B, Qg, list_lengths):
    """probes=None selects the full-probe fast layout."""
    if probes is None:
        return build_full_scan_tasks(nq, list_offsets, B, Qg, list_lengths=list_lengths)
    return build_scan_tasks(probes, list_offsets, B, Qg, list_lengths=list_lengths)


def device_task_bounds(
    nq: int, nprobe: int, lens_arr: np.ndarray, B: int, Qg: int
) -> Tuple[int, int, int]:
    """Static upper bounds for the on-device task builder.

    With c_l = queries probing list l (c_l <= nq, sum c_l = P = nq*nprobe)
    and topsum = sum of the nprobe LARGEST per-list block counts:

    T = sum_l ceil(c_l/Qg)*blocks_l <= nq*topsum/Qg + total_blocks
        (sum_l c_l*blocks_l is maximized by concentrating all pairs on the
        blockiest lists at c_l = nq each — i.e. nq * topsum)
    G = sum_l ceil(c_l/Qg)          <= P/Qg + nlist (+1 sentinel)
    S = max_q sum_{probed l} blocks_l <= min(topsum, total_blocks)

    topsum replaces the r3 bound nprobe*max_blocks, which under skewed list
    lengths (one 100-block list among 2-block lists) over-allocated the task
    and merge buffers ~10-50x (ADVICE r3 medium: ~1GB+ transient scatter
    buffers per search). All derive from build-time list geometry only, so
    jit shapes stay stable per (nq, nprobe) and the builder needs NO host
    sync."""
    lens = np.asarray(lens_arr, np.int64)
    blocks = (lens + B - 1) // B
    total_blocks = int(blocks.sum())
    if blocks.size > nprobe:
        topsum = int(np.sort(blocks)[-nprobe:].sum())
    else:
        topsum = int(blocks.sum())
    P = nq * nprobe
    T_max = (nq * topsum + Qg - 1) // Qg + total_blocks + 1
    G_max = P // Qg + int(lens.size) + 2
    S_max = max(1, int(min(topsum, total_blocks)))
    return T_max, G_max, S_max


@partial(jax.jit, static_argnames=("B", "Qg", "T_max", "G_max", "nlist"))
def build_scan_tasks_jax(
    probes: jax.Array,  # (nq, nprobe) int32, -1 padded
    offsets: jax.Array,  # (nlist+1,) int32 block-aligned starts (CSR)
    lens: jax.Array,  # (nlist,) int32 TRUE list lengths
    *,
    B: int,
    Qg: int,
    T_max: int,
    G_max: int,
    nlist: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """DEVICE-side mirror of build_scan_tasks: (query, probed-list) pairs ->
    dense (list-block x query-group) tasks, entirely in XLA.

    The host inversion + packed task h2d cost 50-170ms + ~10MB/50MBps per
    search over the axon tunnel (measured r3: 80ms build at nprobe=16 on 1
    vCPU; every h2d ~30ms flat + ~50MB/s) — on device the whole build is a
    sort + cumsums costing ~1ms and NOTHING crosses the PCIe/tunnel boundary.
    Trailing tasks beyond the true count have nrows=0 / qids=-1 (the kernels
    already mask padded tasks). Returns (row_start, nrows, list_id, qids
    (T_max,Qg), slots (T_max,Qg))."""
    nq, nprobe = probes.shape
    P = nq * nprobe
    flat_l = probes.reshape(-1).astype(jnp.int32)
    flat_q = jnp.repeat(jnp.arange(nq, dtype=jnp.int32), nprobe)
    lens_ext = jnp.concatenate(
        [lens.astype(jnp.int32), jnp.zeros((1,), jnp.int32)]
    )  # sentinel list `nlist` has length 0
    safe_l = jnp.clip(flat_l, 0, nlist - 1)
    valid = (flat_l >= 0) & (lens_ext[safe_l] > 0)
    key_l = jnp.where(valid, flat_l, nlist)  # invalid pairs sort to the end

    order = jnp.argsort(key_l, stable=True)
    sl = key_l[order]
    sq = jnp.where(valid[order], flat_q[order], -1)

    pair_blocks = (lens_ext[sl] + (B - 1)) // B  # 0 for the sentinel

    idx = jnp.arange(P, dtype=jnp.int32)
    lchange = jnp.concatenate([jnp.ones((1,), bool), sl[1:] != sl[:-1]])
    last_start = jax.lax.cummax(jnp.where(lchange, idx, -1))
    rank = idx - last_start  # rank of the pair within its list run
    g = rank // Qg
    col = rank % Qg
    gchange = lchange | jnp.concatenate([jnp.ones((1,), bool), g[1:] != g[:-1]])
    pg = jnp.cumsum(gchange.astype(jnp.int32)) - 1  # pair-group index
    pg = jnp.minimum(pg, G_max - 1)

    # per-query merge-slot bases: exclusive cumsum of pair blocks in the
    # ORIGINAL query-major order (each query's pairs are contiguous there)
    pb_orig = jnp.where(valid, (lens_ext[safe_l] + (B - 1)) // B, 0).reshape(nq, nprobe)
    cs = jnp.cumsum(pb_orig, axis=1)
    slot_sorted = (cs - pb_orig).reshape(-1)[order]

    group_list = jnp.full((G_max,), nlist, jnp.int32).at[pg].set(sl)
    group_blocks = jnp.zeros((G_max,), jnp.int32).at[pg].set(
        pair_blocks.astype(jnp.int32)
    )
    qids_g = jnp.full((G_max, Qg), -1, jnp.int32).at[pg, col].set(sq)
    slots_g = jnp.zeros((G_max, Qg), jnp.int32).at[pg, col].set(
        slot_sorted.astype(jnp.int32)
    )

    gb_csum = jnp.cumsum(group_blocks)
    gb_excl = gb_csum - group_blocks
    T_total = gb_csum[-1]
    t_idx = jnp.arange(T_max, dtype=jnp.int32)
    tg = jnp.minimum(
        jnp.searchsorted(gb_csum, t_idx, side="right").astype(jnp.int32), G_max - 1
    )
    valid_t = t_idx < T_total
    task_b = t_idx - gb_excl[tg]
    task_list = jnp.minimum(group_list[tg], nlist)
    row_start = jnp.where(valid_t, offsets[task_list].astype(jnp.int32) + task_b * B, 0)
    nrows = jnp.where(valid_t, jnp.clip(lens_ext[task_list] - task_b * B, 0, B), 0)
    qids_t = jnp.where(valid_t[:, None], qids_g[tg], -1)
    slots_t = jnp.where(valid_t[:, None], slots_g[tg] + task_b[:, None], 0)
    list_t = jnp.where(valid_t, jnp.minimum(task_list, nlist - 1), 0)
    return row_start, nrows, list_t, qids_t, slots_t


def _pad_pow2(n: int, minimum: int = 16) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


def _pad16(n: int, minimum: int = 16) -> int:
    """Merge-pool slot padding: multiples of 16, NOT powers of two. The
    (nq, S*kk) merge/top-k shapes scale linearly with S, and the pow2 jump
    64->128 at nprobe 12->16 measured 23.0k -> 39.0k QPS when replaced with
    S=80 (on-chip, 1M IVF_FLAT e2e). Only S uses this: the task-count axis
    Tc keeps pow2 bucketing so a knob ladder reuses ONE Mosaic scan compile
    instead of recompiling per rung."""
    return max(minimum, -(-n // 16) * 16)


# ---------------------------------------------------------------------------
# Device scan kernels
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "kind", "B", "Qg", "kk", "is_l2", "has_mask", "sq_levels", "sq_packed4",
        "is_jaccard", "prec",
    ),
)
def _scan_chunk(
    q: jax.Array,  # (nq, d) f32 (rotated for rabitq)
    store: Dict[str, jax.Array],
    row_start: jax.Array,  # (Tc,)
    nrows: jax.Array,  # (Tc,)
    list_id: jax.Array,  # (Tc,)
    qids: jax.Array,  # (Tc, Qg)
    keep_sorted: Optional[jax.Array],  # (nb_pad,) bool or None
    *,
    kind: str,
    B: int,
    Qg: int,
    kk: int,
    is_l2: bool,
    has_mask: bool,
    sq_levels: int = 0,
    sq_packed4: bool = False,
    is_jaccard: bool = False,
    prec: str = "exact",
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scores (Tc,Qg,kk) larger-is-better, positions (Tc,Qg,kk))."""
    from .distances import precision_from_name

    mp = precision_from_name(prec)
    d = q.shape[1]

    def one_task(start, n, lid, qidx):
        qs = q[jnp.clip(qidx, 0)]  # (Qg, d)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        col_valid = col < n

        if kind == "rabitq":
            signs = jax.lax.dynamic_slice(store["signs"], (start, 0), (B, d)).astype(jnp.float32)
            r_norm = jax.lax.dynamic_slice(store["r_norm"], (start,), (B,))
            t = jax.lax.dynamic_slice(store["t"], (start,), (B,))
            c_rot = store["centroids_rot"][lid]
            qr = qs - c_rot[None, :]  # rotated query residual (Qg, d)
            dots = jnp.dot(qr, signs.T, preferred_element_type=jnp.float32, precision=mp)
            denom = jnp.maximum(t, 1e-6)[None, :] * np.sqrt(d)
            ip_est = r_norm[None, :] * dots / denom
            if is_l2:
                q_res_sq = jnp.sum(qr**2, axis=1, keepdims=True)
                score = -(q_res_sq + (r_norm**2)[None, :] - 2.0 * ip_est)
            else:  # IP: <q,x> = <q,c> + <q,r>_est ; q here is rotated full query
                qc = jnp.dot(qs, c_rot, preferred_element_type=jnp.float32, precision=mp)[:, None]
                score = qc + ip_est
        else:
            if kind == "raw":
                rows = jax.lax.dynamic_slice(store["data"], (start, 0), (B, d)).astype(jnp.float32)
                norms = jax.lax.dynamic_slice(store["norms"], (start,), (B,)) if is_l2 else None
            elif kind == "pq":
                m = store["codes"].shape[1]
                codes = jax.lax.dynamic_slice(store["codes"], (start, 0), (B, m))
                books = store["codebooks"]  # (m, ksub, sub_dim)
                ksub, sub_dim = books.shape[1], books.shape[2]
                flat_books = books.reshape(m * ksub, sub_dim)
                idx = codes.astype(jnp.int32) + (jnp.arange(m, dtype=jnp.int32) * ksub)[None, :]
                dec = jnp.take(flat_books, idx, axis=0)  # (B, m, sub_dim)
                rows = dec.reshape(B, m * sub_dim)
                # OPQ stores codes in the rotated frame: q arrives rotated,
                # decode adds the ROTATED centroid (cent_scan)
                cents_pq = store["cent_scan"] if "cent_scan" in store else store["centroids"]
                dpad = cents_pq.shape[1] - rows.shape[1]
                if dpad:  # centroids carry the device feature padding
                    rows = jnp.pad(rows, ((0, 0), (0, dpad)))
                rows = rows + cents_pq[lid][None, :]
                norms = jnp.sum(rows**2, axis=1) if is_l2 else None
            elif kind == "sq":
                code_dim = store["codes"].shape[1]
                codes = jax.lax.dynamic_slice(store["codes"], (start, 0), (B, code_dim))
                if sq_levels > 0:  # uint8-coded SQ4/SQ6/SQ8
                    if sq_packed4:
                        lo = (codes & 0xF).astype(jnp.float32)
                        hi = (codes >> 4).astype(jnp.float32)
                        qv = jnp.stack([lo, hi], axis=-1).reshape(B, -1)[:, :d]
                    else:
                        qv = codes.astype(jnp.float32)
                    rows = store["vmin"][None, :] + (qv + 0.5) / sq_levels * store["vdiff"][None, :]
                else:  # FP16/BF16 stored directly
                    rows = codes.astype(jnp.float32)
                norms = jnp.sum(rows**2, axis=1) if is_l2 else None
            else:
                raise ValueError(kind)

            dots = jnp.dot(qs, rows.T, preferred_element_type=jnp.float32, precision=mp)
            if is_jaccard:
                # rows are {0,1} bit planes: inter=dots, |b|=norms (0/1 => sq==pop)
                q_pop = jnp.sum(qs, axis=1, keepdims=True)
                b_pop = jnp.sum(rows, axis=1)[None, :]
                union = jnp.maximum(q_pop + b_pop - dots, 1e-9)
                score = dots / union  # similarity; dist = 1 - score
            elif is_l2:
                score = 2.0 * dots - norms[None, :]  # dist = |q|^2 - score
            else:
                score = dots

        score = jnp.where(col_valid, score, NEG_INF)
        if has_mask:
            keep = jax.lax.dynamic_slice(keep_sorted, (start,), (B,))
            score = jnp.where(keep[None, :], score, NEG_INF)
        s, i = jax.lax.top_k(score, kk)
        pos = jnp.where(s == NEG_INF, -1, start + i.astype(jnp.int32))
        return s, pos

    return jax.vmap(one_task)(row_start, nrows, list_id, qids)


@partial(jax.jit, static_argnames=("nq", "S", "kk", "k"))
def _merge_tasks(
    scores: jax.Array,  # (T, Qg, kk)
    pos: jax.Array,  # (T, Qg, kk)
    qids: jax.Array,  # (T, Qg)
    slots: jax.Array,  # (T, Qg)
    *,
    nq: int,
    S: int,
    kk: int,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Invert (task-row -> query-slot) with ONE element scatter, then GATHER
    the (nq, S, kk) pool and run one final top-k.

    The r3 form scattered the kk-wide task rows directly into the pool; XLA
    lowers multi-column row scatters essentially serially on TPU (~0.17us
    per row — measured 160-190ms per 1M-row search batch IN THE HONEST
    post-d2h timing regime, where pre-d2h timings under-measure; see
    .claude/skills/verify). Single-element scatters vectorize (~10ms for the
    same 1M), and row GATHERS run at the documented ~91 Mrows/s, so
    scatter-the-permutation + gather-the-rows is ~4x faster end to end.
    (q, slot) keys are unique by construction; padded task rows get unique
    OUT-OF-BOUNDS keys, which jax scatter drops."""
    Tq = scores.shape[0] * scores.shape[1]
    flat_q = qids.reshape(-1)
    rown = jnp.arange(Tq, dtype=jnp.int32)
    key = jnp.where(
        flat_q >= 0,
        flat_q * S + jnp.minimum(slots.reshape(-1), S - 1),
        nq * S + rown,  # unique OOB -> dropped by the scatter
    )
    # NOTE (r5 A/B, on-chip): a sort+searchsorted inversion (scatter-free)
    # measured 38-117ms vs 8.9ms for this single-element scatter at
    # production shapes — the element scatter IS the fast form on this
    # toolchain; do not "fix" it into a sort.
    inv = jnp.full((nq * S,), -1, jnp.int32).at[key].set(rown, unique_indices=True)
    safe = jnp.clip(inv, 0)
    valid = (inv >= 0)[:, None]
    ms = jnp.where(valid, jnp.take(scores.reshape(-1, kk), safe, axis=0), NEG_INF)
    mp = jnp.where(valid, jnp.take(pos.reshape(-1, kk), safe, axis=0), -1)
    ms = ms.reshape(nq, S * kk)
    mp = mp.reshape(nq, S * kk)
    k_eff = min(k, S * kk)  # fewer candidates than k: pad below
    if os.environ.get("KNOWHERE_MERGE_APPROX") == "1" and k_eff >= 8:
        # experimental: hardware partial-reduce pool top-k (candidate pools
        # re-rank exactly downstream; recall_target bounds pool loss)
        best_s, sel64 = jax.lax.approx_max_k(ms, k_eff, recall_target=0.99)
        sel = sel64.astype(jnp.int32)
    else:
        best_s, sel = jax.lax.top_k(ms, k_eff)
    best_p = jnp.take_along_axis(mp, sel, axis=1)
    best_p = jnp.where(best_s == NEG_INF, -1, best_p)
    if k_eff < k:
        best_s = jnp.pad(best_s, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        best_p = jnp.pad(best_p, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return best_s, best_p


@jax.jit
def pack_results(scores: jax.Array, pos: jax.Array) -> jax.Array:
    """Bitcast-pack (nq,k) f32 scores + (nq,k) i32 positions into one
    (nq, 2k) i32 array. Every device sync costs ~30ms flat on this platform,
    so results cross to the host in ONE transfer."""
    s_i = jax.lax.bitcast_convert_type(scores, jnp.int32)
    return jnp.concatenate([s_i, pos.astype(jnp.int32)], axis=1)


def unpack_results(packed_host: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side inverse of pack_results."""
    k = packed_host.shape[1] // 2
    scores = np.ascontiguousarray(packed_host[:, :k]).view(np.float32)
    pos = packed_host[:, k:]
    return scores, pos


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------


def coarse_probe_host(
    xq: np.ndarray, centroids: np.ndarray, nprobe: int, is_l2: bool
) -> np.ndarray:
    """Host-BLAS coarse probe. On this platform a device probe costs a ~30ms
    d2h sync PLUS serializing behind the query upload; the host has the
    centroids anyway and its sgemm overlaps with the async h2d."""
    dots = xq.astype(np.float32) @ centroids.T.astype(np.float32)
    if is_l2:
        score = 2.0 * dots - np.sum(centroids.astype(np.float64) ** 2, axis=1).astype(np.float32)[None]
    else:
        score = dots
    nprobe = min(nprobe, centroids.shape[0])
    if nprobe >= centroids.shape[0]:
        idx = np.argsort(-score, axis=1, kind="stable")
    else:
        part = np.argpartition(-score, nprobe - 1, axis=1)[:, :nprobe]
        sub = np.take_along_axis(score, part, axis=1)
        idx = np.take_along_axis(part, np.argsort(-sub, axis=1, kind="stable"), axis=1)
    return idx.astype(np.int32)


@partial(jax.jit, static_argnames=("nprobe", "is_l2"))
def coarse_probe(q: jax.Array, centroids: jax.Array, *, nprobe: int, is_l2: bool) -> jax.Array:
    """Top-nprobe nearest lists per query: (nq, nprobe) int32."""
    dots = jnp.dot(
        q, centroids.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH
    )
    if is_l2:
        score = 2.0 * dots - jnp.sum(centroids**2, axis=1)[None, :]
    else:
        score = dots
    _, idx = jax.lax.top_k(score, min(nprobe, centroids.shape[0]))
    return idx.astype(jnp.int32)


def ivf_scan_search(
    q_dev: jax.Array,  # (nq, d) f32 — rotated for rabitq
    store: Dict[str, jax.Array],
    kind: str,
    probes: np.ndarray,  # (nq, nprobe) int32 host
    list_offsets: np.ndarray,  # host (nlist+1,)
    k: int,
    is_l2: bool,
    keep_sorted: Optional[jax.Array] = None,
    B: Optional[int] = None,
    Qg: Optional[int] = None,
    task_chunk: int = 4096,
    sq_levels: int = 0,
    sq_packed4: bool = False,
    is_jaccard: bool = False,
    prec: Optional[str] = None,
    return_device: bool = False,
    list_lengths: Optional[np.ndarray] = None,
    codes_nib: bool = False,  # ADC codes_t is nibble-packed (4-bit fastscan)
) -> Tuple[np.ndarray, np.ndarray]:
    from .distances import matmul_precision_name

    if prec is None:
        prec = matmul_precision_name()
    """Returns (scores (nq,k) larger-is-better np.f32, positions (nq,k) np.i32
    into the SORTED storage; -1 padded). Caller maps positions -> row ids and
    applies per-query distance constants.

    return_device=True skips the final host readback and returns device
    arrays: on this platform every device sync costs ~30ms flat (the axon
    tunnel degrades after the first d2h), so the caller should keep chaining
    device work and sync exactly once."""
    nq = q_dev.shape[0]
    device_probes = probes is not None and isinstance(probes, jax.Array)
    lens_arr = (
        np.asarray(list_lengths, dtype=np.int64)
        if list_lengths is not None
        else np.diff(np.asarray(list_offsets, dtype=np.int64))
    )
    if Qg is None:
        # adaptive query-group width: pad waste is Qg / (avg queries probing a
        # list); small batches / small nprobe want narrow groups (ladder of
        # pow2 to bound recompiles)
        if probes is None:  # full probe: every query touches every list
            avg = nq
            cap = 256  # wider groups amortize block DMA across more queries
        elif device_probes:
            # no host sync to inspect the probes: expected queries per list,
            # biased 2x up — clustered query batches concentrate probes on few
            # lists, and a too-wide group only pads while a too-narrow one
            # multiplies block DMA (ADVICE r3)
            avg = 2 * nq * probes.shape[1] / max(len(lens_arr), 1)
            cap = 128
        else:
            valid_pairs = int((probes >= 0).sum())
            touched = np.unique(probes[probes >= 0])
            avg = valid_pairs / max(len(touched), 1)
            cap = 128
        # Mosaic VMEM guard (measured r3 shape matrix): Qg=256 at d=1024
        # aborts the layout pass while Qg=128 compiles — bound the per-task
        # query scratch (Qg x d x 4B) to 512KB
        d_q = int(q_dev.shape[1])
        while cap > 32 and cap * d_q * 4 > (512 << 10):
            cap //= 2
        Qg = 32
        while Qg < min(avg, cap):
            Qg *= 2

    from .ivf_pallas import pallas_adc_available, pallas_scan_available

    if prec == "int8":
        from .ivf_pallas import pallas_int8_available

        if (
            B is None
            and kind in ("raw", "sq")
            and not is_jaccard
            and pallas_int8_available(store, q_dev.shape[1], k, list_offsets)
        ):
            return _pallas_int8_search(
                q_dev, store, probes, list_offsets, lens_arr, k, is_l2, Qg,
                return_device, keep_sorted=keep_sorted,
            )
        prec = "fast"  # int8 sidecar unavailable: bf16 ranking path

    if (
        B is None
        and kind == "pq"
        and prec != "exact"
        and pallas_adc_available(
            store, q_dev.shape[1], k, list_offsets, keep_sorted is not None,
            nq_pad=nq,
        )
    ):
        return _pallas_adc_search(
            q_dev, store, probes, list_offsets, lens_arr, k, is_l2, Qg,
            return_device, keep_sorted=keep_sorted, nib=codes_nib,
        )

    # typed (bf16/int8) raw stores take the XLA scan: it casts each sliced
    # block (line ~230), keeping persistent HBM at native width; the Pallas
    # raw kernel's block DMA assumes f32 rows
    raw_is_f32 = kind != "raw" or store["data"].dtype == jnp.float32
    if B is None and raw_is_f32 and pallas_scan_available(
        kind, q_dev.shape[1], k, nq, list_offsets,
        keep_sorted is not None, is_jaccard, prec,
    ):
        return _pallas_scan_search(
            q_dev, store, probes, list_offsets, lens_arr, k, is_l2, Qg,
            prec, return_device, keep_sorted=keep_sorted,
        )

    if B is None and kind == "rabitq" and prec != "exact":
        from .ivf_pallas import pallas_rbq_available

        if pallas_rbq_available(store, q_dev.shape[1], k, nq, list_offsets):
            return _pallas_rbq_search(
                q_dev, store, probes, list_offsets, lens_arr, k, is_l2, Qg,
                prec, return_device, keep_sorted=keep_sorted,
            )

    if B is None and kind == "sq":
        from .ivf_pallas import pallas_sq_available

        if pallas_sq_available(
            q_dev.shape[1], store["codes"].shape[1], k, nq, list_offsets,
            keep_sorted is not None, sq_levels, sq_packed4, prec,
        ):
            return _pallas_scan_search(
                q_dev, store, probes, list_offsets, lens_arr, k, is_l2, Qg,
                prec, return_device, kind="sq", sq_levels=sq_levels,
                keep_sorted=keep_sorted,
            )

    if B is None:
        # block size: 512 measures fastest on v5e (1024 halves task count but
        # per-task top-k and PQ-decode gathers grow superlinearly and lose
        # more); shrink only for small-list layouts
        avg_len = float(lens_arr.mean() or 1.0)
        B = 256 if avg_len <= 256 else 512
    if kind in ("pq", "sq", "rabitq"):
        # decode kinds materialize the decoded chunk (Tc x B x d f32) before
        # the matmul — at Tc=4096, B=512, d=128 that OOMs a 16GB chip. Bound
        # the decode buffer to ~256MB per dispatch.
        d = q_dev.shape[1]
        task_chunk = min(task_chunk, max(256, (64 << 20) // max(B * d, 1)))
        if kind == "pq":
            # the codebook gather produces (Tc*B*m, sub_dim) rows; XLA pads
            # the trailing dim to 128 lanes, so sub_dim=2 blows up 64x — bound
            # by PADDED bytes (~2GB)
            m = store["codes"].shape[1]
            task_chunk = min(task_chunk, max(32, (1 << 22) // max(B * m // 128, 1) // 128))
    kk = min(k, B)
    if device_probes:
        (
            rs_dev, nr_dev, li_dev, all_q, all_slot, total, Tc, n_chunks, S,
        ) = _device_tasks_chunked(
            probes, store, list_offsets, lens_arr, B, Qg, task_chunk
        )
    else:
        batch = _build_tasks(probes, nq, list_offsets, B, Qg, list_lengths)
        if batch is None:
            s_empty = np.full((nq, k), NEG_INF, np.float32)
            p_empty = np.full((nq, k), -1, np.int32)
            if return_device:
                return jax.device_put(s_empty), jax.device_put(p_empty)
            return s_empty, p_empty
        T = batch.row_start.shape[0]

        # every device_put costs ~28ms flat once the process is past its first
        # d2h, so ALL chunks' task arrays ship in ONE packed transfer and are
        # sliced on device (uniform chunk padding keeps jit shapes reusable)
        n_chunks = (T + task_chunk - 1) // task_chunk
        Tc = _pad_pow2(min(task_chunk, T))
        total = n_chunks * Tc
        S = _pad16(max(batch.n_slots, 1), minimum=1)

        def padded_all(a, fill):
            out = np.full((total, *a.shape[1:]), fill, a.dtype)
            for c in range(n_chunks):
                s0, e0 = c * task_chunk, min((c + 1) * task_chunk, T)
                out[c * Tc : c * Tc + (e0 - s0)] = a[s0:e0]
            return out

        packed_h = np.concatenate(
            [
                padded_all(batch.row_start, 0),
                padded_all(batch.nrows, 0),
                padded_all(batch.list_id, 0),
                padded_all(batch.qids, -1).reshape(-1),
                padded_all(batch.slots, 0).reshape(-1),
            ]
        ).astype(np.int32)
        packed_dev = jax.device_put(packed_h)  # the ONE h2d for task data
        rs_dev = packed_dev[:total]
        nr_dev = packed_dev[total : 2 * total]
        li_dev = packed_dev[2 * total : 3 * total]
        all_q = packed_dev[3 * total : 3 * total + total * Qg].reshape(total, Qg)
        all_slot = packed_dev[3 * total + total * Qg :].reshape(total, Qg)

    score_chunks, pos_chunks = [], []
    for c in range(n_chunks):
        scores, pos = _scan_chunk(
            q_dev,
            store,
            rs_dev[c * Tc : (c + 1) * Tc],
            nr_dev[c * Tc : (c + 1) * Tc],
            li_dev[c * Tc : (c + 1) * Tc],
            all_q[c * Tc : (c + 1) * Tc],
            keep_sorted,
            kind=kind,
            B=B,
            Qg=Qg,
            kk=kk,
            is_l2=is_l2,
            has_mask=keep_sorted is not None,
            sq_levels=sq_levels,
            sq_packed4=sq_packed4,
            is_jaccard=is_jaccard,
            prec=prec,
        )
        score_chunks.append(scores)
        pos_chunks.append(pos)

    all_s = jnp.concatenate(score_chunks) if n_chunks > 1 else score_chunks[0]
    all_p = jnp.concatenate(pos_chunks) if n_chunks > 1 else pos_chunks[0]

    best_s, best_p = _merge_tasks(all_s, all_p, all_q, all_slot, nq=nq, S=S, kk=kk, k=k)
    if return_device:
        return best_s, best_p
    return np.asarray(best_s), np.asarray(best_p)


@partial(jax.jit, static_argnames=("is_l2",))
def compute_qlut(q: jax.Array, books: jax.Array, *, is_l2: bool) -> jax.Array:
    """Per-query ADC LUT: QLUT[q, m*ksub+v] = f*<q_m, book_m[v]> (f=2 for L2).
    f32 (cast to bf16 per matmul chunk in-kernel — the one-hot matmul selects
    entries, so only per-entry bf16 rounding enters the ranking, below PQ
    reconstruction error)."""
    m, ksub, sub = books.shape
    q3 = q.reshape(q.shape[0], m, sub)
    lut = jnp.einsum(
        "qms,mvs->qmv", q3, books,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    if is_l2:
        lut = 2.0 * lut
    return lut.reshape(q.shape[0], m * ksub)


@partial(jax.jit, static_argnames=("nb_pad", "B"))
def _mask_blocks(keep_sorted: jax.Array, nb_pad: int, B: int) -> jax.Array:
    """Bitset keep mask (bool, sorted storage order) -> (nb_pad//B, 1, B) i32
    blocks the Pallas kernels stream alongside each task's list block."""
    return keep_sorted[:nb_pad].astype(jnp.int32).reshape(nb_pad // B, 1, B)


def _store_geom(store, list_offsets, lens_arr):
    """Device copies of the list geometry, cached in the node's store dict so
    the h2d (~30ms flat on this tunnel) happens once per index, not per
    search."""
    if "offsets_dev" not in store:
        store["offsets_dev"] = jax.device_put(
            np.asarray(list_offsets, dtype=np.int32)
        )
        store["lens_dev"] = jax.device_put(np.asarray(lens_arr, dtype=np.int32))
    return store["offsets_dev"], store["lens_dev"]


def _device_tasks_chunked(
    probes_dev: jax.Array,
    store: Dict[str, jax.Array],
    list_offsets: np.ndarray,
    lens_arr: np.ndarray,
    B: int,
    Qg: int,
    chunk: int,
):
    """Run the on-device task builder with chunk-aligned static bounds.

    Returns (row_start, nrows, list_id, qids (total,Qg), slots (total,Qg),
    total, Tc, n_chunks, S) — all device arrays sized to n_chunks*Tc so the
    caller's per-chunk slicing needs no host-side task count."""
    nq_p, nprobe = probes_dev.shape
    T_max, G_max, S_max = device_task_bounds(nq_p, nprobe, lens_arr, B, Qg)
    Tc = (min(chunk, T_max) + 7) // 8 * 8
    n_chunks = (T_max + Tc - 1) // Tc
    total = n_chunks * Tc
    off_dev, lens_dev = _store_geom(store, list_offsets, lens_arr)
    nlist = len(lens_arr)
    row_start, nrows, list_t, qids_t, slots_t = build_scan_tasks_jax(
        probes_dev, off_dev, lens_dev,
        B=B, Qg=Qg, T_max=total, G_max=G_max, nlist=nlist,
    )
    S = _pad16(S_max, minimum=1)
    return row_start, nrows, list_t, qids_t, slots_t, total, Tc, n_chunks, S


def _pallas_adc_search(
    q_dev: jax.Array,  # (nq, d) f32, nq pow2-padded
    store: Dict[str, jax.Array],
    probes: np.ndarray,
    list_offsets: np.ndarray,
    lens_arr: np.ndarray,
    k: int,
    is_l2: bool,
    Qg: int,
    return_device: bool,
    keep_sorted: Optional[jax.Array] = None,
    interpret: bool = False,
    nib: bool = False,  # codes_t nibble-packed (4-bit fastscan layout)
):
    """PQ/ScaNN ADC scan via the Pallas one-hot-matmul kernel (ops/ivf_pallas).

    One dense task batch over ALL queries — the per-task QLUT is computed
    IN-KERNEL as qs @ block-diagonal-codebooks (no LUT HBM traffic, no query
    slabbing; small slabs destroyed query-group density and multiplied the
    task count 20x). Task arrays ship in ONE packed h2d."""
    from .ivf_pallas import interpret_forced

    interpret = interpret or interpret_forced()
    from .ivf_pallas import (
        LIST_ALIGN,
        adc_mc_geometry,
        adc_s_stack,
        pallas_adc_tasks,
        pallas_adc_tasks_mc,
        task_kk,
    )

    nq, d = q_dev.shape
    books = store["codebooks"]
    m, ksub, _sub = books.shape
    geom = adc_mc_geometry(m, ksub, d)  # None -> single-grid kernel
    if geom is not None:
        # the chunked kernel's double-buffered books stream is ~8MB of the
        # 16MB scoped-vmem stack; Qg-scaled temps must fit the rest
        # (measured: Qg=128 at GIST needs 20.8MB, Qg=64 fits)
        Qg = min(Qg, 64)
    B = LIST_ALIGN
    kk = task_kk(k, B)
    # chunk bound: the pre-gathered q_task buffer is (chunk, Qg, d) f32 —
    # cap it at ~512MB transient HBM (qids left SMEM with the query-table
    # gather, so the old 480KB scalar-prefetch bound no longer applies)
    d_chunk = int(q_dev.shape[1])
    chunk = max(8, min(16384, (512 << 20) // max(Qg * d_chunk * 4, 1)) // 8 * 8)

    if isinstance(probes, jax.Array):
        (
            rs_dev, nrow_dev, lid_dev, qids2_dev, slots_dev, total, Tc, n_chunks, S,
        ) = _device_tasks_chunked(probes, store, list_offsets, lens_arr, B, Qg, chunk)
        blk_dev = rs_dev // B
        qids_dev = qids2_dev.reshape(-1)
    else:
        batch = _build_tasks(probes, nq, list_offsets, B, Qg, lens_arr)
        if batch is None:
            s_empty = np.full((nq, k), NEG_INF, np.float32)
            p_empty = np.full((nq, k), -1, np.int32)
            if return_device:
                return jax.device_put(s_empty), jax.device_put(p_empty)
            return s_empty, p_empty

        T = batch.row_start.shape[0]
        n_chunks = (T + chunk - 1) // chunk
        Tc = (min(chunk, T) + 7) // 8 * 8
        total = n_chunks * Tc
        S = _pad16(max(batch.n_slots, 1), minimum=1)

        def padded_all(a, fill):
            out = np.full((total, *a.shape[1:]), fill, a.dtype)
            for c in range(n_chunks):
                s0, e0 = c * chunk, min((c + 1) * chunk, T)
                out[c * Tc : c * Tc + (e0 - s0)] = a[s0:e0]
            return out

        blk_h = padded_all((batch.row_start // B).astype(np.int32), 0)
        nrow_h = padded_all(batch.nrows, 0)
        lid_h = padded_all(batch.list_id, 0)
        qids_h = padded_all(batch.qids, -1)
        slots_h = padded_all(batch.slots, 0)
        packed_h = np.concatenate(
            [blk_h, nrow_h, lid_h, qids_h.reshape(-1), slots_h.reshape(-1)]
        ).astype(np.int32)
        packed_dev = jax.device_put(packed_h)  # the ONE h2d
        blk_dev = packed_dev[:total]
        nrow_dev = packed_dev[total : 2 * total]
        lid_dev = packed_dev[2 * total : 3 * total]
        qids_dev = packed_dev[3 * total : 3 * total + total * Qg]
        slots_dev = packed_dev[3 * total + total * Qg :].reshape(total, Qg)

    s_stack = adc_s_stack(m, ksub)
    nb_pad = int(list_offsets[-1])
    keep_blk = (
        _mask_blocks(keep_sorted, nb_pad=nb_pad, B=B)
        if keep_sorted is not None
        else None
    )
    score_chunks, pos_chunks = [], []
    for c in range(n_chunks):
        qids_c = qids_dev[c * Tc * Qg : (c + 1) * Tc * Qg].reshape(Tc, Qg)
        q_task = jnp.take(q_dev, jnp.clip(qids_c, 0), axis=0)
        args = (
            blk_dev[c * Tc : (c + 1) * Tc],
            nrow_dev[c * Tc : (c + 1) * Tc],
            lid_dev[c * Tc : (c + 1) * Tc],
            q_task,
            store["books_bd"],
            store["clut"],
            store.get("cent_scan", store["centroids"]),  # rotated frame for OPQ
            store["codes_t"],
            keep_blk,
        )
        if geom is not None:  # large-m chunked kernel (GIST m=96)
            scores, pos = pallas_adc_tasks_mc(
                *args, B=B, Qg=Qg, kk=kk, m_c=geom[0], ksub=ksub, MC=geom[1],
                is_l2=is_l2, interpret=interpret,
            )
        else:
            scores, pos = pallas_adc_tasks(
                *args, B=B, Qg=Qg, kk=kk, m=m, ksub=ksub, s_stack=s_stack,
                is_l2=is_l2, nib=nib, interpret=interpret,
            )
        score_chunks.append(scores)
        pos_chunks.append(pos)

    all_s = jnp.concatenate(score_chunks) if n_chunks > 1 else score_chunks[0]
    all_p = jnp.concatenate(pos_chunks) if n_chunks > 1 else pos_chunks[0]
    all_q = qids_dev.reshape(total, Qg)

    best_s, best_p = _merge_tasks(all_s, all_p, all_q, slots_dev, nq=nq, S=S, kk=kk, k=k)
    if return_device:
        return best_s, best_p
    return np.asarray(best_s), np.asarray(best_p)


def _pallas_rbq_search(
    q_dev: jax.Array,  # (nq_pad, d) f32 ROTATED queries
    store: Dict[str, jax.Array],
    probes: np.ndarray,
    list_offsets: np.ndarray,
    lens_arr: np.ndarray,
    k: int,
    is_l2: bool,
    Qg: int,
    prec: str,
    return_device: bool,
    keep_sorted: Optional[jax.Array] = None,
    interpret: bool = False,
):
    """RaBitQ sign-plane scan via the Pallas kernel (ops/ivf_pallas
    _rbq_kernel); task packing mirrors _pallas_adc_search (lids needed for
    the per-list rotated centroid row)."""
    from .ivf_pallas import interpret_forced

    interpret = interpret or interpret_forced()
    from .ivf_pallas import LIST_ALIGN, pallas_rbq_tasks, task_kk

    nq = q_dev.shape[0]
    B = LIST_ALIGN
    kk = task_kk(k, B)
    d_chunk = int(q_dev.shape[1])
    chunk = max(8, min(16384, (512 << 20) // max(Qg * d_chunk * 4, 1)) // 8 * 8)

    if isinstance(probes, jax.Array):
        (
            rs_dev, nrow_dev, lid_dev, qids2_dev, slots_dev, total, Tc, n_chunks, S,
        ) = _device_tasks_chunked(probes, store, list_offsets, lens_arr, B, Qg, chunk)
        blk_dev = rs_dev // B
        qids_dev = qids2_dev.reshape(-1)
    else:
        batch = _build_tasks(probes, nq, list_offsets, B, Qg, lens_arr)
        if batch is None:
            s_empty = np.full((nq, k), NEG_INF, np.float32)
            p_empty = np.full((nq, k), -1, np.int32)
            if return_device:
                return jax.device_put(s_empty), jax.device_put(p_empty)
            return s_empty, p_empty

        T = batch.row_start.shape[0]
        n_chunks = (T + chunk - 1) // chunk
        Tc = (min(chunk, T) + 7) // 8 * 8
        total = n_chunks * Tc
        S = _pad16(max(batch.n_slots, 1), minimum=1)

        def padded_all(a, fill):
            out = np.full((total, *a.shape[1:]), fill, a.dtype)
            for c in range(n_chunks):
                s0, e0 = c * chunk, min((c + 1) * chunk, T)
                out[c * Tc : c * Tc + (e0 - s0)] = a[s0:e0]
            return out

        packed_h = np.concatenate(
            [
                padded_all((batch.row_start // B).astype(np.int32), 0),
                padded_all(batch.nrows, 0),
                padded_all(batch.list_id, 0),
                padded_all(batch.qids, -1).reshape(-1),
                padded_all(batch.slots, 0).reshape(-1),
            ]
        ).astype(np.int32)
        packed_dev = jax.device_put(packed_h)  # the ONE h2d
        blk_dev = packed_dev[:total]
        nrow_dev = packed_dev[total : 2 * total]
        lid_dev = packed_dev[2 * total : 3 * total]
        qids_dev = packed_dev[3 * total : 3 * total + total * Qg]
        slots_dev = packed_dev[3 * total + total * Qg :].reshape(total, Qg)

    nb_pad = int(list_offsets[-1])
    keep_blk = (
        _mask_blocks(keep_sorted, nb_pad=nb_pad, B=B)
        if keep_sorted is not None
        else None
    )
    three_pass = prec == "fast"
    score_chunks, pos_chunks = [], []
    for c in range(n_chunks):
        qids_c = qids_dev[c * Tc * Qg : (c + 1) * Tc * Qg].reshape(Tc, Qg)
        q_task = jnp.take(q_dev, jnp.clip(qids_c, 0), axis=0)
        scores, pos = pallas_rbq_tasks(
            blk_dev[c * Tc : (c + 1) * Tc],
            nrow_dev[c * Tc : (c + 1) * Tc],
            lid_dev[c * Tc : (c + 1) * Tc],
            q_task,
            store["centroids_rot"],
            store["signs"],
            store["rn_blk"],
            store["t_blk"],
            keep_blk,
            B=B, Qg=Qg, kk=kk, is_l2=is_l2, three_pass=three_pass,
            interpret=interpret,
        )
        score_chunks.append(scores)
        pos_chunks.append(pos)

    all_s = jnp.concatenate(score_chunks) if n_chunks > 1 else score_chunks[0]
    all_p = jnp.concatenate(pos_chunks) if n_chunks > 1 else pos_chunks[0]
    all_q = qids_dev.reshape(total, Qg)

    best_s, best_p = _merge_tasks(all_s, all_p, all_q, slots_dev, nq=nq, S=S, kk=kk, k=k)
    if return_device:
        return best_s, best_p
    return np.asarray(best_s), np.asarray(best_p)


@partial(jax.jit, static_argnames=())
def quantize_queries_int8(
    q_dev: jax.Array, mu: jax.Array, scale: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-query symmetric int8 quantization in the data's per-dim scale
    frame (see ivf_pallas._int8_kernel docstring): z = (q - mu) * scale,
    zi = round(z / sz) with sz = max|z|/127. Returns (zi (nq,d) i8,
    sz (nq,) f32)."""
    z = (q_dev.astype(jnp.float32) - mu[None, :]) * scale[None, :]
    m = jnp.max(jnp.abs(z), axis=1, keepdims=True)
    sz = jnp.maximum(m, 1e-30) / 127.0
    zi = jnp.clip(jnp.round(z / sz), -127, 127).astype(jnp.int8)
    return zi, sz[:, 0]


def _pallas_int8_search(
    q_dev: jax.Array,  # (nq_pad, d) f32
    store: Dict[str, jax.Array],
    probes: np.ndarray,
    list_offsets: np.ndarray,
    lens_arr: np.ndarray,
    k: int,
    is_l2: bool,
    Qg: int,
    return_device: bool,
    keep_sorted: Optional[jax.Array] = None,
    interpret: bool = False,
):
    """int8 MXU candidate scan (ops/ivf_pallas._int8_kernel): queries are
    quantized per-batch on device, codes are the per-dim-scaled int8 store.
    The caller re-ranks the merged pool exactly (two_stage refine) — this
    path NEVER returns final distances. Task packing mirrors
    _pallas_scan_search."""
    from .ivf_pallas import interpret_forced

    interpret = interpret or interpret_forced()
    from .ivf_pallas import LIST_ALIGN, pallas_int8_tasks, task_kk

    nq = q_dev.shape[0]
    B = LIST_ALIGN
    # candidate-generation path: the merged pool re-ranks EXACTLY afterwards,
    # so a small per-block top-kk suffices (the true top-k spreads over the
    # ~nprobe*blocks probed blocks) — and the kk-pass VPU top-k is the
    # kernel's dominant cost, not the int8 matmul. But the rerank can only
    # recover candidates the kernel KEPT: at k=100 on clustered data one
    # 512-row block of the nearest list can hold >16 of the true top-k, so
    # kk=16 only applies for small k; larger k keeps task_kk's 32 (ADVICE r4).
    kk = min(task_kk(k, B), 16 if k <= 32 else 32)
    d_chunk = int(q_dev.shape[1])
    chunk = max(8, min(16384, (512 << 20) // max(Qg * d_chunk * 4, 1)) // 8 * 8)

    zi, szv = quantize_queries_int8(q_dev, store["i8_mu"], store["i8_scale"])

    if isinstance(probes, jax.Array):
        (
            rs_dev, nrows_dev, _lid, qids2_dev, slots_dev, total, Tc, n_chunks, S,
        ) = _device_tasks_chunked(probes, store, list_offsets, lens_arr, B, Qg, chunk)
        blk_dev = rs_dev // B
        qids_dev = qids2_dev.reshape(-1)
    else:
        batch = _build_tasks(probes, nq, list_offsets, B, Qg, lens_arr)
        if batch is None:
            s_empty = np.full((nq, k), NEG_INF, np.float32)
            p_empty = np.full((nq, k), -1, np.int32)
            if return_device:
                return jax.device_put(s_empty), jax.device_put(p_empty)
            return s_empty, p_empty

        T = batch.row_start.shape[0]
        n_chunks = (T + chunk - 1) // chunk
        Tc = (min(chunk, T) + 7) // 8 * 8
        total = n_chunks * Tc
        S = _pad16(max(batch.n_slots, 1), minimum=1)

        def padded_all(a, fill):
            out = np.full((total, *a.shape[1:]), fill, a.dtype)
            for c in range(n_chunks):
                s0, e0 = c * chunk, min((c + 1) * chunk, T)
                out[c * Tc : c * Tc + (e0 - s0)] = a[s0:e0]
            return out

        packed_h = np.concatenate(
            [
                padded_all((batch.row_start // B).astype(np.int32), 0),
                padded_all(batch.nrows, 0),
                padded_all(batch.qids, -1).reshape(-1),
                padded_all(batch.slots, 0).reshape(-1),
            ]
        ).astype(np.int32)
        packed_dev = jax.device_put(packed_h)  # the ONE h2d for task data
        blk_dev = packed_dev[:total]
        nrows_dev = packed_dev[total : 2 * total]
        qids_dev = packed_dev[2 * total : 2 * total + total * Qg]
        slots_dev = packed_dev[2 * total + total * Qg :].reshape(total, Qg)

    nb_pad = int(list_offsets[-1])
    keep_blk = (
        _mask_blocks(keep_sorted, nb_pad=nb_pad, B=B)
        if keep_sorted is not None
        else None
    )
    score_chunks, pos_chunks = [], []
    for c in range(n_chunks):
        qids_c = qids_dev[c * Tc * Qg : (c + 1) * Tc * Qg].reshape(Tc, Qg)
        safe = jnp.clip(qids_c, 0)
        q_task = jnp.take(zi, safe, axis=0)  # (Tc, Qg, d) i8
        s_task = jnp.take(szv, safe, axis=0)[..., None]  # (Tc, Qg, 1) f32
        scores, pos = pallas_int8_tasks(
            blk_dev[c * Tc : (c + 1) * Tc],
            nrows_dev[c * Tc : (c + 1) * Tc],
            q_task,
            s_task,
            store.get("data_i8", store.get("codes")),  # SQ8 scans its u8 codes
            store["i8_nrm_blk"],
            keep_blk,
            B=B, Qg=Qg, kk=kk, is_l2=is_l2, interpret=interpret,
        )
        score_chunks.append(scores)
        pos_chunks.append(pos)

    all_s = jnp.concatenate(score_chunks) if n_chunks > 1 else score_chunks[0]
    all_p = jnp.concatenate(pos_chunks) if n_chunks > 1 else pos_chunks[0]
    all_q = qids_dev.reshape(total, Qg)

    best_s, best_p = _merge_tasks(all_s, all_p, all_q, slots_dev, nq=nq, S=S, kk=kk, k=k)
    if return_device:
        return best_s, best_p
    return np.asarray(best_s), np.asarray(best_p)


def _pallas_scan_search(
    q_dev: jax.Array,
    store: Dict[str, jax.Array],
    probes: np.ndarray,
    list_offsets: np.ndarray,
    lens_arr: np.ndarray,
    k: int,
    is_l2: bool,
    Qg: int,
    prec: str,
    return_device: bool,
    kind: str = "raw",
    sq_levels: int = 0,
    keep_sorted: Optional[jax.Array] = None,
):
    """Hot raw-vector / SQ-code path: block-aligned Pallas task scan
    (ops/ivf_pallas; kind 'sq' decodes u8 codes in-kernel)."""
    from .ivf_pallas import interpret_forced

    interpret = interpret_forced()
    from .ivf_pallas import LIST_ALIGN, pallas_scan_tasks, pallas_sq_tasks, task_kk

    nq = q_dev.shape[0]
    B = LIST_ALIGN
    kk = task_kk(k, B)  # per-task top-k width; the merge produces the full k
    three_pass = prec == "fast"
    # chunk bound: the pre-gathered q_task buffer is (chunk, Qg, d) f32 —
    # cap it at ~512MB transient HBM (qids left SMEM with the query-table
    # gather, so the old 480KB scalar-prefetch bound no longer applies)
    d_chunk = int(q_dev.shape[1])
    chunk = max(8, min(16384, (512 << 20) // max(Qg * d_chunk * 4, 1)) // 8 * 8)

    if isinstance(probes, jax.Array):
        # fully-fused path: probes stay on device, tasks are BUILT on device
        # (build_scan_tasks_jax) — nothing crosses the tunnel between the
        # query upload and the packed result readback
        (
            rs_dev, nrows_dev, _lid, qids2_dev, slots_dev, total, Tc, n_chunks, S,
        ) = _device_tasks_chunked(probes, store, list_offsets, lens_arr, B, Qg, chunk)
        blk_dev = rs_dev // B
        qids_dev = qids2_dev.reshape(-1)
    else:
        batch = _build_tasks(probes, nq, list_offsets, B, Qg, lens_arr)
        if batch is None:
            s_empty = np.full((nq, k), NEG_INF, np.float32)
            p_empty = np.full((nq, k), -1, np.int32)
            if return_device:
                return jax.device_put(s_empty), jax.device_put(p_empty)
            return s_empty, p_empty

        T = batch.row_start.shape[0]
        blk_all = (batch.row_start // B).astype(np.int32)  # exact: aligned storage
        n_chunks = (T + chunk - 1) // chunk
        Tc = (min(chunk, T) + 7) // 8 * 8  # uniform per-chunk task count
        total = n_chunks * Tc
        S = _pad16(max(batch.n_slots, 1), minimum=1)

        def padded_all(a, fill):
            out = np.full((total, *a.shape[1:]), fill, a.dtype)
            for c in range(n_chunks):
                s0, e0 = c * chunk, min((c + 1) * chunk, T)
                out[c * Tc : c * Tc + (e0 - s0)] = a[s0:e0]
            return out

        blk_h = padded_all(blk_all, 0)
        nrows_h = padded_all(batch.nrows, 0)
        qids_h = padded_all(batch.qids, -1)
        slots_h = padded_all(batch.slots, 0)
        packed_h = np.concatenate(
            [blk_h, nrows_h, qids_h.reshape(-1), slots_h.reshape(-1)]
        ).astype(np.int32)
        packed_dev = jax.device_put(packed_h)  # the ONE h2d for task data
        blk_dev = packed_dev[:total]
        nrows_dev = packed_dev[total : 2 * total]
        qids_dev = packed_dev[2 * total : 2 * total + total * Qg]
        slots_dev = packed_dev[2 * total + total * Qg :].reshape(total, Qg)

    nb_pad = int(list_offsets[-1])
    keep_blk = (
        _mask_blocks(keep_sorted, nb_pad=nb_pad, B=B)
        if keep_sorted is not None
        else None
    )
    score_chunks, pos_chunks = [], []
    for c in range(n_chunks):
        qids_c = qids_dev[c * Tc * Qg : (c + 1) * Tc * Qg].reshape(Tc, Qg)
        q_task = jnp.take(q_dev, jnp.clip(qids_c, 0), axis=0)
        args = (
            blk_dev[c * Tc : (c + 1) * Tc],
            nrows_dev[c * Tc : (c + 1) * Tc],
            q_task,
        )
        if kind == "sq":
            scores, pos = pallas_sq_tasks(
                *args,
                store["vmin"].reshape(1, -1),
                store["vdiff"].reshape(1, -1),
                store["codes"],
                keep_blk,
                B=B, Qg=Qg, kk=kk, levels=sq_levels, is_l2=is_l2,
                three_pass=three_pass, interpret=interpret,
            )
        else:
            scores, pos = pallas_scan_tasks(
                *args,
                store["data"],
                keep_blk,
                B=B,
                Qg=Qg,
                kk=kk,
                is_l2=is_l2,
                three_pass=three_pass,
                interpret=interpret,
            )
        score_chunks.append(scores)
        pos_chunks.append(pos)

    all_s = jnp.concatenate(score_chunks) if n_chunks > 1 else score_chunks[0]
    all_p = jnp.concatenate(pos_chunks) if n_chunks > 1 else pos_chunks[0]
    all_q = qids_dev.reshape(total, Qg)

    best_s, best_p = _merge_tasks(all_s, all_p, all_q, slots_dev, nq=nq, S=S, kk=kk, k=k)
    if return_device:
        return best_s, best_p
    return np.asarray(best_s), np.asarray(best_p)
