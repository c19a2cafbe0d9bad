"""Sparse scoring engine — batched TAAT accumulation on device.

Replaces the reference's DAAT WAND/MaxScore/BlockMax pointer-walking searchers
(reference: src/index/sparse/searcher/{daat_wand,daat_maxscore,
block_max_wand,block_max_maxscore}.h and the SINDI batched algorithm,
sindi_inverted_index.h). Those are scalar, branch-heavy loops; on TPU the
winning formulation is batched term-at-a-time: for a query batch, gather every
touched posting entry once, multiply by the query weight, scatter-add into a
dense (nq_chunk, nb) score accumulator, then run one top-k. This is exact
(same scores as WAND et al., which are pruning strategies, not different
metrics), so `inverted_index_algo` values are accepted and routed here.

Postings are CSR-by-dimension (doc_ids/vals, dim offset table). BM25 doc
values are the standard transform over stored term frequencies with per-doc
lengths (reference sparse_utils.h BM25 computer), materialized once per
(k1, b, avgdl) and cached on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class SparsePostings:
    """Dim-major CSR postings."""

    dim_start: Dict[int, Tuple[int, int]]  # dim -> (start, end) into entries
    doc_ids: np.ndarray  # (nnz,) int32
    vals: np.ndarray  # (nnz,) f32 (raw term frequencies / weights)
    row_sums: np.ndarray  # (nb,) f32 document lengths (sum of tf)
    nb: int


def build_postings(rows: List[Dict[int, float]], drop_ratio_build: float = 0.0) -> SparsePostings:
    nb = len(rows)
    dims_l, docs_l, vals_l = [], [], []
    row_sums = np.zeros(nb, dtype=np.float32)
    for i, row in enumerate(rows):
        items = row.items() if isinstance(row, dict) else zip(*row)
        for d, v in items:
            dims_l.append(d)
            docs_l.append(i)
            vals_l.append(v)
            row_sums[i] += v
    dims = np.asarray(dims_l, dtype=np.int64)
    docs = np.asarray(docs_l, dtype=np.int32)
    vals = np.asarray(vals_l, dtype=np.float32)
    if drop_ratio_build > 0 and vals.size:
        thresh = np.quantile(np.abs(vals), drop_ratio_build)
        keep = np.abs(vals) >= thresh
        dims, docs, vals = dims[keep], docs[keep], vals[keep]
    order = np.argsort(dims, kind="stable")
    dims, docs, vals = dims[order], docs[order], vals[order]
    uniq, starts = np.unique(dims, return_index=True)
    ends = np.append(starts[1:], dims.size)
    dim_start = {int(d): (int(s), int(e)) for d, s, e in zip(uniq, starts, ends)}
    return SparsePostings(dim_start, docs, vals, row_sums, nb)


def bm25_transform(p: SparsePostings, k1: float, b: float, avgdl: float) -> np.ndarray:
    """Per-entry BM25 doc value from stored tf."""
    avgdl = max(avgdl, 1e-9)
    dl = p.row_sums[p.doc_ids]
    return (p.vals * (k1 + 1.0) / (p.vals + k1 * (1.0 - b + b * dl / avgdl))).astype(np.float32)


@partial(jax.jit, static_argnames=("nqc", "nb", "k"))
def _score_and_topk(
    doc_ids: jax.Array,  # (nnz,) int32 device
    vals: jax.Array,  # (nnz,) f32 device (already metric-transformed)
    entry_idx: jax.Array,  # (U,) int32 — positions into doc_ids/vals
    qid: jax.Array,  # (U,) int32
    w: jax.Array,  # (U,) f32 query weights
    mask: Optional[jax.Array],  # (nb,) bool keep or None
    *,
    nqc: int,
    nb: int,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    docs = jnp.take(doc_ids, entry_idx)
    contrib = w * jnp.take(vals, entry_idx)
    scores = jnp.zeros((nqc, nb), dtype=jnp.float32)
    scores = scores.at[qid, docs].add(contrib)
    if mask is not None:
        scores = jnp.where(mask[None, :], scores, -jnp.inf)
    # sparse convention: zero overlap is "no match" — exclude from results
    scores = jnp.where(scores > 0, scores, -jnp.inf)
    s, i = jax.lax.top_k(scores, k)
    i = jnp.where(s == -jnp.inf, -1, i)
    # one packed d2h per chunk (every sync costs ~30ms on this platform)
    return jnp.concatenate([jax.lax.bitcast_convert_type(s, jnp.int32), i], axis=1)


@partial(jax.jit, static_argnames=("nqc", "nb"))
def _score_full(
    doc_ids: jax.Array,
    vals: jax.Array,
    entry_idx: jax.Array,
    qid: jax.Array,
    w: jax.Array,
    mask: Optional[jax.Array],
    *,
    nqc: int,
    nb: int,
) -> jax.Array:
    """Full (nqc, nb) score matrix — no top-k (iterator / range completion)."""
    docs = jnp.take(doc_ids, entry_idx)
    contrib = w * jnp.take(vals, entry_idx)
    scores = jnp.zeros((nqc, nb), dtype=jnp.float32)
    scores = scores.at[qid, docs].add(contrib)
    if mask is not None:
        scores = jnp.where(mask[None, :], scores, -jnp.inf)
    return jnp.where(scores > 0, scores, -jnp.inf)


def _gather_query_entries(postings, q_rows, s0, e0, drop_ratio_search):
    """Host-side assembly of the chunk's (entry_idx, qid, weight) task arrays."""
    entry_list, qid_list, w_list = [], [], []
    for qi in range(s0, e0):
        row = q_rows[qi]
        items = list(row.items()) if isinstance(row, dict) else list(zip(*row))
        if drop_ratio_search > 0 and items:
            absvals = np.abs(np.asarray([v for _, v in items], np.float32))
            thresh = np.quantile(absvals, drop_ratio_search)
            items = [(d, v) for d, v in items if abs(v) >= thresh]
        for d, v in items:
            slot = postings.dim_start.get(int(d))
            if slot is None:
                continue
            st, en = slot
            entry_list.append(np.arange(st, en, dtype=np.int32))
            n = en - st
            qid_list.append(np.full(n, qi - s0, np.int32))
            w_list.append(np.full(n, v, np.float32))
    if not entry_list:
        return None
    entry_idx = np.concatenate(entry_list)
    qids = np.concatenate(qid_list)
    ws = np.concatenate(w_list)
    # pad U to a pow2 ladder to bound recompiles (dead entries score qid 0
    # with weight 0 — harmless)
    U = entry_idx.size
    P = 1024
    while P < U:
        P *= 2
    if P != U:
        entry_idx = np.concatenate([entry_idx, np.zeros(P - U, np.int32)])
        qids = np.concatenate([qids, np.zeros(P - U, np.int32)])
        ws = np.concatenate([ws, np.zeros(P - U, np.float32)])
    return entry_idx, qids, ws, P


def sparse_full_scores(
    postings: SparsePostings,
    vals_dev: jax.Array,
    doc_ids_dev: jax.Array,
    q_rows: List[Dict[int, float]],
    drop_ratio_search: float = 0.0,
    mask: Optional[jax.Array] = None,
) -> np.ndarray:
    """Exact scores for EVERY document: (nq, nb) f32, -inf where no overlap.
    Complete by construction — feeds iterators and range search (the
    reference's PrecomputedDistanceIterator over BF scores,
    sparse_index_node.cc:254)."""
    nq = len(q_rows)
    nb = postings.nb
    out = np.full((nq, nb), -np.inf, np.float32)
    q_chunk = min(1024, max(16, (256 << 20) // max(nb * 4, 1)))
    from .. import comp as _comp

    for s0 in range(0, nq, q_chunk):
        _comp.check_current_cancellation()  # per-chunk (ivf.cc:962 analog)
        e0 = min(s0 + q_chunk, nq)
        task = _gather_query_entries(postings, q_rows, s0, e0, drop_ratio_search)
        if task is None:
            continue
        entry_idx, qids, ws, P = task
        packed_h = np.concatenate([entry_idx, qids, ws.view(np.int32)])
        packed_dev = jax.device_put(packed_h)
        scores = _score_full(
            doc_ids_dev,
            vals_dev,
            packed_dev[:P],
            packed_dev[P : 2 * P],
            jax.lax.bitcast_convert_type(packed_dev[2 * P :], jnp.float32),
            mask,
            nqc=e0 - s0,
            nb=nb,
        )
        out[s0:e0] = np.asarray(scores)
    return out


def sparse_search(
    postings: SparsePostings,
    vals_dev: jax.Array,  # device copy of (possibly BM25-transformed) vals
    doc_ids_dev: jax.Array,
    q_rows: List[Dict[int, float]],
    k: int,
    drop_ratio_search: float = 0.0,
    mask: Optional[jax.Array] = None,
    q_chunk: int = 64,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (scores (nq,k) f32, ids (nq,k) int64, -1 padded)."""
    nq = len(q_rows)
    nb = postings.nb
    out_s = np.full((nq, k), -np.inf, np.float32)
    out_i = np.full((nq, k), -1, np.int64)
    kk = min(k, nb)
    # widen the chunk while the dense (nqc, nb) accumulator stays <=256MB —
    # fewer chunks means fewer ~30ms device syncs
    q_chunk = max(q_chunk, min(1024, max(64, (256 << 20) // max(nb * 4, 1))))

    from ..comp import check_current_cancellation

    for s0 in range(0, nq, q_chunk):
        check_current_cancellation()  # per-chunk (ivf.cc:962 analog)
        e0 = min(s0 + q_chunk, nq)
        nqc = e0 - s0
        task = _gather_query_entries(postings, q_rows, s0, e0, drop_ratio_search)
        if task is None:
            continue
        entry_idx, qids, ws, P = task
        # ONE h2d for the chunk's task arrays (weights bitcast into the
        # same i32 buffer), sliced on device
        packed_h = np.concatenate([entry_idx, qids, ws.view(np.int32)])
        packed_dev = jax.device_put(packed_h)
        packed = _score_and_topk(
            doc_ids_dev,
            vals_dev,
            packed_dev[:P],
            packed_dev[P : 2 * P],
            jax.lax.bitcast_convert_type(packed_dev[2 * P :], jnp.float32),
            mask,
            nqc=q_chunk if nqc == q_chunk else nqc,
            nb=nb,
            k=kk,
        )
        packed_np = np.asarray(packed)  # the ONE sync
        out_s[s0:e0, :kk] = np.ascontiguousarray(packed_np[:nqc, :kk]).view(np.float32)
        out_i[s0:e0, :kk] = packed_np[:nqc, kk:].astype(np.int64)
    return out_s, out_i
