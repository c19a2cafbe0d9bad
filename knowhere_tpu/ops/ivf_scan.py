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
    probes: np.ndarray, list_offsets: np.ndarray, B: int, Qg: int
) -> Optional[TaskBatch]:
    """Invert (query -> probed lists) into (list-block -> query-group) tasks.

    `probes` is (nq, nprobe) int32 (entries may be -1 = padding).
    """
    nq, _ = probes.shape
    flat_l = probes.reshape(-1)
    flat_q = np.repeat(np.arange(nq, dtype=np.int32), probes.shape[1])
    valid = flat_l >= 0
    flat_l, flat_q = flat_l[valid], flat_q[valid]
    if flat_l.size == 0:
        return None
    order = np.argsort(flat_l, kind="stable")
    sl, sq = flat_l[order], flat_q[order]
    uniq, starts = np.unique(sl, return_index=True)
    ends = np.append(starts[1:], sl.size)

    row_start: List[np.ndarray] = []
    nrows: List[np.ndarray] = []
    list_ids: List[np.ndarray] = []
    qids: List[np.ndarray] = []
    slots: List[np.ndarray] = []
    slot_counter = np.zeros(nq, dtype=np.int32)

    for li, s, e in zip(uniq.tolist(), starts.tolist(), ends.tolist()):
        lo, hi = int(list_offsets[li]), int(list_offsets[li + 1])
        length = hi - lo
        if length == 0:
            continue
        n_blocks = (length + B - 1) // B
        queries = sq[s:e]
        for g0 in range(0, len(queries), Qg):
            grp = queries[g0 : g0 + Qg]
            pad = Qg - len(grp)
            grp_slots_base = slot_counter[grp].copy()
            slot_counter[grp] += n_blocks
            for b in range(n_blocks):
                bs = lo + b * B
                row_start.append(bs)
                nrows.append(min(B, hi - bs))
                list_ids.append(li)
                q_arr = np.full(Qg, -1, np.int32)
                q_arr[: len(grp)] = grp
                qids.append(q_arr)
                s_arr = np.full(Qg, 0, np.int32)
                s_arr[: len(grp)] = grp_slots_base + b
                slots.append(s_arr)
            del pad

    if not row_start:
        return None
    return TaskBatch(
        row_start=np.asarray(row_start, np.int32),
        nrows=np.asarray(nrows, np.int32),
        list_id=np.asarray(list_ids, np.int32),
        qids=np.stack(qids).astype(np.int32),
        slots=np.stack(slots).astype(np.int32),
        n_slots=int(slot_counter.max()),
        B=B,
        Qg=Qg,
    )


def _pad_pow2(n: int, minimum: int = 16) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# Device scan kernels
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "kind", "B", "Qg", "kk", "is_l2", "has_mask", "sq_levels", "sq_packed4", "is_jaccard",
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
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scores (Tc,Qg,kk) larger-is-better, positions (Tc,Qg,kk))."""
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
            dots = jnp.dot(qr, signs.T, preferred_element_type=jnp.float32)
            denom = jnp.maximum(t, 1e-6)[None, :] * np.sqrt(d)
            ip_est = r_norm[None, :] * dots / denom
            if is_l2:
                q_res_sq = jnp.sum(qr**2, axis=1, keepdims=True)
                score = -(q_res_sq + (r_norm**2)[None, :] - 2.0 * ip_est)
            else:  # IP: <q,x> = <q,c> + <q,r>_est ; q here is rotated full query
                qc = jnp.dot(qs, c_rot, preferred_element_type=jnp.float32)[:, None]
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
                rows = dec.reshape(B, m * sub_dim) + store["centroids"][lid][None, :]
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

            dots = jnp.dot(qs, rows.T, preferred_element_type=jnp.float32)
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
    """Scatter per-task top-k into (nq, S) slots, then one final top-k."""
    flat_idx = jnp.where(qids >= 0, qids * S + jnp.minimum(slots, S - 1), nq * S)
    merged_s = jnp.full((nq * S + 1, kk), NEG_INF, dtype=jnp.float32)
    merged_p = jnp.full((nq * S + 1, kk), -1, dtype=jnp.int32)
    merged_s = merged_s.at[flat_idx.reshape(-1)].set(scores.reshape(-1, kk))
    merged_p = merged_p.at[flat_idx.reshape(-1)].set(pos.reshape(-1, kk))
    ms = merged_s[: nq * S].reshape(nq, S * kk)
    mp = merged_p[: nq * S].reshape(nq, S * kk)
    best_s, sel = jax.lax.top_k(ms, k)
    best_p = jnp.take_along_axis(mp, sel, axis=1)
    best_p = jnp.where(best_s == NEG_INF, -1, best_p)
    return best_s, best_p


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("nprobe", "is_l2"))
def coarse_probe(q: jax.Array, centroids: jax.Array, *, nprobe: int, is_l2: bool) -> jax.Array:
    """Top-nprobe nearest lists per query: (nq, nprobe) int32."""
    dots = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
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
    B: int = 512,
    Qg: int = 128,
    task_chunk: int = 1024,
    sq_levels: int = 0,
    sq_packed4: bool = False,
    is_jaccard: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (scores (nq,k) larger-is-better np.f32, positions (nq,k) np.i32
    into the SORTED storage; -1 padded). Caller maps positions -> row ids and
    applies per-query distance constants."""
    nq = q_dev.shape[0]
    batch = build_scan_tasks(probes, list_offsets, B, Qg)
    if batch is None:
        return (
            np.full((nq, k), NEG_INF, np.float32),
            np.full((nq, k), -1, np.int32),
        )
    kk = min(k, B)
    T = batch.row_start.shape[0]

    score_chunks, pos_chunks, qid_chunks, slot_chunks = [], [], [], []
    for s in range(0, T, task_chunk):
        e = min(s + task_chunk, T)
        Tc = _pad_pow2(e - s)
        pad = Tc - (e - s)

        def padded(a, fill):
            sl = a[s:e]
            if pad:
                shape = (pad, *sl.shape[1:])
                sl = np.concatenate([sl, np.full(shape, fill, a.dtype)])
            return sl

        scores, pos = _scan_chunk(
            q_dev,
            store,
            jax.device_put(padded(batch.row_start, 0)),
            jax.device_put(padded(batch.nrows, 0)),
            jax.device_put(padded(batch.list_id, 0)),
            jax.device_put(padded(batch.qids, -1)),
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
        )
        score_chunks.append(scores)
        pos_chunks.append(pos)
        qid_chunks.append(jax.device_put(padded(batch.qids, -1)))
        slot_chunks.append(jax.device_put(padded(batch.slots, 0)))

    all_s = jnp.concatenate(score_chunks) if len(score_chunks) > 1 else score_chunks[0]
    all_p = jnp.concatenate(pos_chunks) if len(pos_chunks) > 1 else pos_chunks[0]
    all_q = jnp.concatenate(qid_chunks) if len(qid_chunks) > 1 else qid_chunks[0]
    all_slot = jnp.concatenate(slot_chunks) if len(slot_chunks) > 1 else slot_chunks[0]

    S = _pad_pow2(max(batch.n_slots, 1), minimum=1)
    best_s, best_p = _merge_tasks(all_s, all_p, all_q, all_slot, nq=nq, S=S, kk=kk, k=k)
    return np.asarray(best_s), np.asarray(best_p)
