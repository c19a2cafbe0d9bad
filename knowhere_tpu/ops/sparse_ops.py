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


# ---------------------------------------------------------------------------
# Padded doc-major engine — the default exhaustive scorer.
#
# The scatter-TAAT engine above assembles posting-entry index arrays on the
# host per query; with Zipf-popular terms whose posting lists span most of
# the corpus that is GBs of host work per chunk. This engine instead stores
# documents as PADDED fixed-width rows (dims_pad/vals_pad, (nb, L)) with
# REMAPPED dim ids, densifies the query chunk into a (n_dims+1, nqc) matrix,
# and scores entirely on device with regular gathers + an L-axis reduce —
# no scatter, no host assembly. This is the SINDI batched formulation
# (reference sindi_inverted_index.h) expressed TPU-first.
# ---------------------------------------------------------------------------


@dataclass
class PaddedDocs:
    """Doc-major padded storage with remapped dims."""

    dims_pad: np.ndarray  # (nb_pad, L) int32, remapped; sentinel = n_dims
    vals_pad: np.ndarray  # (nb_pad, L) f32 raw term weights; 0 at padding
    dim_map: Dict[int, int]  # original dim id -> remapped [0, n_dims)
    n_dims: int
    L: int
    nb: int  # true rows (nb_pad >= nb, sentinel rows beyond)
    row_sums: np.ndarray  # (nb_pad,) f32 document lengths (for BM25)


def build_padded_docs(
    rows: List[Dict[int, float]],
    drop_ratio_build: float = 0.0,
    max_pad_ratio: float = 4.0,
    max_elements: int = 64 << 20,
) -> Optional[PaddedDocs]:
    """None when the length distribution makes padding pathological
    (max nnz > max(max_pad_ratio * p99, 256)) or the padded matrix would
    exceed max_elements (absolute budget — a multi-million-row corpus must
    not materialize O(nb*L*8B) host+HBM for this engine; round-2 advisor
    finding) — caller falls back to another engine."""
    nb = len(rows)
    if nb == 0:
        return None
    lens = np.fromiter((len(r) if isinstance(r, dict) else len(r[0]) for r in rows), np.int64, nb)
    max_len = int(lens.max(initial=0))
    if max_len == 0:
        return None
    p99 = float(np.quantile(lens, 0.99))
    if max_len > max(max_pad_ratio * p99, 256):
        return None
    L_est = max(8, -(-max_len // 8) * 8)
    if (nb + 256) * L_est > max_elements:
        return None
    # assemble entries (row-major), mirroring build_postings' drop semantics
    dims_l, vals_l, rid_l = [], [], []
    for i, row in enumerate(rows):
        items = row.items() if isinstance(row, dict) else zip(*row)
        for d, v in items:
            dims_l.append(int(d))
            vals_l.append(v)
            rid_l.append(i)
    dims = np.asarray(dims_l, np.int64)
    vals = np.asarray(vals_l, np.float32)
    rids = np.asarray(rid_l, np.int64)
    row_sums_all = np.zeros(nb, np.float32)
    np.add.at(row_sums_all, rids, vals)
    if drop_ratio_build > 0 and vals.size:
        thresh = np.quantile(np.abs(vals), drop_ratio_build)
        keep = np.abs(vals) >= thresh
        dims, vals, rids = dims[keep], vals[keep], rids[keep]
    uniq = np.unique(dims)
    n_dims = int(uniq.size)
    if n_dims > (1 << 17):
        # densify_queries allocates a (n_dims+1, nqc) f32 matrix per chunk;
        # for large-vocab embeddings that is 0.1-1GB of host alloc + transfer
        # per search chunk (round-2 advisor finding) — fall back
        return None
    dim_map = {int(d): i for i, d in enumerate(uniq)}
    remapped = np.searchsorted(uniq, dims).astype(np.int32)
    # per-row slot position (entries are row-major already)
    counts = np.bincount(rids, minlength=nb)
    L = int(counts.max(initial=1))
    L = max(8, -(-L // 8) * 8)  # multiple of 8 for clean lanes
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(dims.size, dtype=np.int64) - np.repeat(starts, counts)
    W_ALIGN = 256
    nb_pad = max(W_ALIGN, -(-nb // W_ALIGN) * W_ALIGN)
    dims_pad = np.full((nb_pad, L), n_dims, np.int32)
    vals_pad = np.zeros((nb_pad, L), np.float32)
    dims_pad[rids, slot] = remapped
    vals_pad[rids, slot] = vals
    row_sums = np.zeros(nb_pad, np.float32)
    row_sums[:nb] = row_sums_all
    return PaddedDocs(dims_pad, vals_pad, dim_map, n_dims, L, nb, row_sums)


def padded_bm25_vals(p: PaddedDocs, k1: float, b: float, avgdl: float) -> np.ndarray:
    """BM25 doc-value transform of vals_pad (reference sparse_utils.h)."""
    avgdl = max(avgdl, 1e-9)
    dl = p.row_sums[:, None]
    tf = p.vals_pad
    out = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    return np.where(tf > 0, out, 0.0).astype(np.float32)


@partial(jax.jit, static_argnames=("k", "W", "nblocks", "has_mask"))
def _padded_topk_kernel(dims_pad, vals_pad, QT, maskf, *, k, W, nblocks, has_mask):
    """Exhaustive block scan with a running per-query top-k pool.

    dims_pad (nb_pad, L) i32 / vals_pad (nb_pad, L) f32 / QT (n_dims+1, nqc)
    f32 (sentinel row zero) / maskf (nb_pad,) f32 keep flags (ignored unless
    has_mask). Returns (nqc, 2k) i32: bitcast scores || ids."""
    L = dims_pad.shape[1]
    nqc = QT.shape[1]

    def body(carry, b):
        s_pool, i_pool = carry
        r0 = b * W
        d = jax.lax.dynamic_slice(dims_pad, (r0, 0), (W, L))
        v = jax.lax.dynamic_slice(vals_pad, (r0, 0), (W, L))
        g = jnp.take(QT, d.reshape(-1), axis=0).reshape(W, L, nqc)
        sb = jnp.einsum("wln,wl->nw", g, v)  # (nqc, W)
        if has_mask:
            mb = jax.lax.dynamic_slice(maskf, (r0,), (W,))
            sb = jnp.where(mb[None, :] > 0, sb, -jnp.inf)
        sb = jnp.where(sb > 0, sb, -jnp.inf)
        ids_b = r0 + jnp.arange(W, dtype=jnp.int32)
        cat_s = jnp.concatenate([s_pool, sb], axis=1)
        cat_i = jnp.concatenate([i_pool, jnp.broadcast_to(ids_b[None, :], (nqc, W))], axis=1)
        s2, sel = jax.lax.top_k(cat_s, k)
        i2 = jnp.take_along_axis(cat_i, sel, axis=1)
        return (s2, i2), None

    init = (
        jnp.full((nqc, k), -jnp.inf, jnp.float32),
        jnp.full((nqc, k), -1, jnp.int32),
    )
    (s, i), _ = jax.lax.scan(body, init, jnp.arange(nblocks))
    i = jnp.where(jnp.isfinite(s), i, -1)
    return jnp.concatenate([jax.lax.bitcast_convert_type(s, jnp.int32), i], axis=1)


@partial(jax.jit, static_argnames=("W", "nblocks", "has_mask"))
def _padded_full_kernel(dims_pad, vals_pad, QT, maskf, *, W, nblocks, has_mask):
    """Full (nqc, nb_pad) score matrix (-inf = no overlap / filtered)."""
    L = dims_pad.shape[1]
    nqc = QT.shape[1]

    def blockfn(b):
        r0 = b * W
        d = jax.lax.dynamic_slice(dims_pad, (r0, 0), (W, L))
        v = jax.lax.dynamic_slice(vals_pad, (r0, 0), (W, L))
        g = jnp.take(QT, d.reshape(-1), axis=0).reshape(W, L, nqc)
        sb = jnp.einsum("wln,wl->nw", g, v)
        if has_mask:
            mb = jax.lax.dynamic_slice(maskf, (r0,), (W,))
            sb = jnp.where(mb[None, :] > 0, sb, -jnp.inf)
        return jnp.where(sb > 0, sb, -jnp.inf)

    out = jax.lax.map(blockfn, jnp.arange(nblocks))  # (nblocks, nqc, W)
    return jnp.moveaxis(out, 0, 1).reshape(nqc, nblocks * W)


def _pick_block_w(L: int, nqc: int, nb_pad: int, budget_bytes: int = 128 << 20) -> int:
    """Largest W that divides nb_pad (always a multiple of 256), is a multiple
    of 256, and keeps the (W, L, nqc) gather intermediate under budget."""
    target = int(np.clip((budget_bytes // max(L * nqc * 4, 1)) // 256 * 256, 256, 16384))
    w = min(target, nb_pad)
    while w > 256 and nb_pad % w:
        w -= 256
    return max(w, 256)


def densify_queries(
    padded: PaddedDocs, q_rows, s0: int, e0: int, drop_ratio_search: float, nqc_pad: int
) -> np.ndarray:
    """(n_dims+1, nqc_pad) dense transposed query matrix; sentinel row 0."""
    QT = np.zeros((padded.n_dims + 1, nqc_pad), np.float32)
    for ci, qi in enumerate(range(s0, e0)):
        for d, v in _drop_items(q_rows[qi], drop_ratio_search):
            r = padded.dim_map.get(int(d))
            if r is not None:
                QT[r, ci] += v
    QT[padded.n_dims, :] = 0.0
    return QT


def _nqc_ladder(n: int) -> int:
    p = 16
    while p < n:
        p *= 2
    return min(p, 256)


def sparse_search_padded(
    padded: PaddedDocs,
    dims_dev: jax.Array,  # device copy of padded.dims_pad
    vals_dev: jax.Array,  # device copy of (possibly BM25-transformed) vals_pad
    q_rows: List[Dict[int, float]],
    k: int,
    drop_ratio_search: float = 0.0,
    mask: Optional[jax.Array] = None,  # (>=nb,) bool device or None
    cancel_check=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exhaustive exact device scan. Returns ((nq,k) f32, (nq,k) i64 ids)."""
    nq = len(q_rows)
    nb_pad = padded.dims_pad.shape[0]
    kk = min(k, padded.nb)
    out_s = np.full((nq, k), -np.inf, np.float32)
    out_i = np.full((nq, k), -1, np.int64)
    q_chunk = 256
    maskf = None
    if mask is not None:
        mf = jnp.zeros(nb_pad, jnp.float32)
        maskf = mf.at[: mask.shape[0]].set(mask.astype(jnp.float32))
    for s0 in range(0, nq, q_chunk):
        if cancel_check is not None:
            cancel_check()
        e0 = min(s0 + q_chunk, nq)
        nqc_pad = _nqc_ladder(e0 - s0)
        W = _pick_block_w(padded.L, nqc_pad, nb_pad)
        nblocks = nb_pad // W
        QT = densify_queries(padded, q_rows, s0, e0, drop_ratio_search, nqc_pad)
        packed = _padded_topk_kernel(
            dims_dev, vals_dev, jax.device_put(QT),
            maskf if maskf is not None else jnp.zeros((), jnp.float32),
            k=kk, W=W, nblocks=nblocks, has_mask=maskf is not None,
        )
        packed_np = np.asarray(packed)[: e0 - s0]
        out_s[s0:e0, :kk] = np.ascontiguousarray(packed_np[:, :kk]).view(np.float32)
        out_i[s0:e0, :kk] = packed_np[:, kk:].astype(np.int64)
    return out_s, out_i


def sparse_full_scores_padded(
    padded: PaddedDocs,
    dims_dev: jax.Array,
    vals_dev: jax.Array,
    q_rows: List[Dict[int, float]],
    drop_ratio_search: float = 0.0,
    mask: Optional[jax.Array] = None,
    cancel_check=None,
) -> np.ndarray:
    """Exact (nq, nb) scores, -inf = no overlap/filtered — device block scan."""
    nq = len(q_rows)
    nb_pad = padded.dims_pad.shape[0]
    out = np.full((nq, padded.nb), -np.inf, np.float32)
    q_chunk = min(256, max(16, (256 << 20) // max(nb_pad * 4, 1)))
    maskf = None
    if mask is not None:
        mf = jnp.zeros(nb_pad, jnp.float32)
        maskf = mf.at[: mask.shape[0]].set(mask.astype(jnp.float32))
    for s0 in range(0, nq, q_chunk):
        if cancel_check is not None:
            cancel_check()
        e0 = min(s0 + q_chunk, nq)
        nqc_pad = _nqc_ladder(e0 - s0)
        W = _pick_block_w(padded.L, nqc_pad, nb_pad)
        nblocks = nb_pad // W
        QT = densify_queries(padded, q_rows, s0, e0, drop_ratio_search, nqc_pad)
        scores = _padded_full_kernel(
            dims_dev, vals_dev, jax.device_put(QT),
            maskf if maskf is not None else jnp.zeros((), jnp.float32),
            W=W, nblocks=nblocks, has_mask=maskf is not None,
        )
        out[s0:e0] = np.asarray(scores)[: e0 - s0, : padded.nb]
    return out


# ---------------------------------------------------------------------------
# Hybrid head/tail engine — the default exact scorer.
#
# The padded doc-major engine above is HBM-gather-bound: every one of the
# nb*L padded slots gathers an nqc-wide query row, so a full scan moves
# nb*L*nq*4 bytes through the gather unit regardless of chunking (~270 GB for
# the 200k-doc bench leg — measured 381 QPS). The reference prunes that work
# per-doc with WAND/MaxScore upper bounds (daat_wand.h); the TPU-correct
# reformulation splits the VOCABULARY by posting length instead:
#   - head: the top-F dims by nnz count (Zipf mass lives here) stored as a
#     dense (F, nb) f32 slab — scored as ONE MXU matmul per query chunk
#     (precision=HIGHEST, fp32-exact), which is the machine's fastest path
#     for exactly the popular terms whose posting lists WAND cannot skip;
#   - tail: the remaining dims stay CSR postings — short lists by
#     construction, scatter-added on top of the matmul scores.
# Exact at any drop_ratio_search (drop only filters query terms, as in the
# reference: sparse_index_config.h:97-126), so DAAT_WAND/DAAT_MAXSCORE/
# BLOCK_MAX_*/SINDI route here with identical results.
# ---------------------------------------------------------------------------


@dataclass
class HybridSlab:
    """Frequency-split storage: dense head slab + CSR tail postings."""

    head_dims: np.ndarray  # (F,) original dim ids, nnz-descending
    head_map: Dict[int, int]  # original dim id -> slab row
    slab: np.ndarray  # (F, nb_pad) f32 raw term values; 0 = absent
    tail: SparsePostings  # postings restricted to tail dims
    row_sums: np.ndarray  # (nb,) f32 document lengths (full rows, for BM25)
    nb: int
    nb_pad: int
    F: int
    head_nnz: int  # entries covered by the slab (coverage stat)
    total_nnz: int
    tail_bits: int = 0  # >0: resident tail ids are a pack_fixed u32 stream
    vals_bf16: bool = False  # resident values stored bf16 (gated rescore)


def build_hybrid_slab(
    rows: List[Dict[int, float]],
    drop_ratio_build: float = 0.0,
    budget_bytes: int = 512 << 20,
) -> Optional[HybridSlab]:
    """None when no dims / empty corpus. F auto-sizes to the slab budget
    (element-capped, ADVICE round-2) and is a multiple of 128 for MXU tiling."""
    nb = len(rows)
    if nb == 0:
        return None
    dims_l, vals_l, rid_l = [], [], []
    row_sums = np.zeros(nb, np.float32)
    for i, row in enumerate(rows):
        items = row.items() if isinstance(row, dict) else zip(*row)
        for d, v in items:
            dims_l.append(int(d))
            vals_l.append(v)
            rid_l.append(i)
            row_sums[i] += v
    if not dims_l:
        return None
    dims = np.asarray(dims_l, np.int64)
    vals = np.asarray(vals_l, np.float32)
    rids = np.asarray(rid_l, np.int32)
    if drop_ratio_build > 0 and vals.size:
        thresh = np.quantile(np.abs(vals), drop_ratio_build)
        keep = np.abs(vals) >= thresh
        dims, vals, rids = dims[keep], vals[keep], rids[keep]
    uniq, counts = np.unique(dims, return_counts=True)
    n_dims = int(uniq.size)
    nb_pad = max(256, -(-nb // 256) * 256)
    f_budget = max(128, int(budget_bytes // (4 * nb_pad)) // 128 * 128)
    F = min(-(-n_dims // 128) * 128, f_budget, 4096)
    order = np.argsort(-counts, kind="stable")
    n_head = min(n_dims, F)
    head_dims = uniq[order[:n_head]]
    head_map = {int(d): i for i, d in enumerate(head_dims)}
    is_head = np.isin(dims, head_dims)
    slab = np.zeros((F, nb_pad), np.float32)
    hsel = np.nonzero(is_head)[0]
    if hsel.size:
        hrow = np.searchsorted(np.sort(head_dims), dims[hsel])
        # map via sorted order -> original head slot
        sorted_to_slot = np.argsort(head_dims, kind="stable")
        slab[sorted_to_slot[hrow], rids[hsel]] = vals[hsel]
    # tail CSR (dim-major)
    tsel = np.nonzero(~is_head)[0]
    tdims, tdocs, tvals = dims[tsel], rids[tsel], vals[tsel]
    t_order = np.argsort(tdims, kind="stable")
    tdims, tdocs, tvals = tdims[t_order], tdocs[t_order], tvals[t_order]
    t_uniq, t_starts = np.unique(tdims, return_index=True)
    t_ends = np.append(t_starts[1:], tdims.size)
    tail = SparsePostings(
        {int(d): (int(s), int(e)) for d, s, e in zip(t_uniq, t_starts, t_ends)},
        tdocs.astype(np.int32),
        tvals.astype(np.float32),
        row_sums,
        nb,
    )
    return HybridSlab(
        head_dims, head_map, slab, tail, row_sums, nb, nb_pad, F,
        int(hsel.size), int(dims.size),
    )


def hybrid_bm25_slab(h: HybridSlab, k1: float, b: float, avgdl: float) -> np.ndarray:
    """BM25 doc-value transform of the head slab (sparse_utils.h computer)."""
    avgdl = max(avgdl, 1e-9)
    dl = np.zeros(h.nb_pad, np.float32)
    dl[: h.nb] = h.row_sums
    tf = h.slab
    out = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl[None, :] / avgdl))
    return np.where(tf > 0, out, 0.0).astype(np.float32)


def _densify_head(slab, qh_idx, qh_val):
    """(nqc, W) (slot, val) pairs -> (nqc, F) dense head queries ON DEVICE:
    the dense Qh was the h2d bottleneck (nqc x F x 4B per chunk through a
    ~50MB/s tunnel vs W<=128 pairs per query)."""
    F = slab.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, qh_idx.shape, 0)
    safe = jnp.where(qh_idx >= 0, qh_idx, F)
    return (
        jnp.zeros((qh_idx.shape[0], F + 1), jnp.float32)
        .at[row, safe]
        .add(qh_val)[:, :F]
    )


@partial(jax.jit, static_argnames=("k", "has_mask", "has_tail", "tail_bits"))
def _hybrid_topk_kernel(
    slab,  # (F, nb_pad) f32 device (metric-transformed)
    tail_doc_ids,  # (nnz_t,) ids device — or a packed u32 stream (tail_bits>0)
    tail_vals,  # (nnz_t,) f32 device (metric-transformed)
    qh_idx,  # (nqc, W) i32 head slots, -1 padded
    qh_val,  # (nqc, W) f32 head weights
    entry_idx,  # (P,) i32 into tail postings
    qid,  # (P,) i32
    w,  # (P,) f32
    maskf,  # (nb_pad,) f32 keep flags (ignored unless has_mask)
    *,
    k: int,
    has_mask: bool,
    has_tail: bool,
    tail_bits: int = 0,
):
    Qh = _densify_head(slab, qh_idx, qh_val)
    scores = jax.lax.dot_general(
        Qh, slab, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (nqc, nb_pad)
    if has_tail:
        # resident-compression aware: ids are a ceil(log2(nb))-bit packed
        # stream decoded IN the gather (ops/bitpack.py; exact), legacy
        # u16/u32 when packing is opted out; vals bf16 (rounding covered by
        # the exact pool rescore gate in models/sparse.py) — widen after
        if tail_bits:
            from .bitpack import unpack_gather

            docs = unpack_gather(tail_doc_ids, entry_idx, tail_bits).astype(jnp.int32)
        else:
            docs = jnp.take(tail_doc_ids, entry_idx).astype(jnp.int32)
        contrib = w * jnp.take(tail_vals, entry_idx).astype(jnp.float32)
        scores = scores.at[qid, docs].add(contrib)
    if has_mask:
        scores = jnp.where(maskf[None, :] > 0, scores, -jnp.inf)
    scores = jnp.where(scores > 0, scores, -jnp.inf)
    s, i = jax.lax.top_k(scores, k)
    i = jnp.where(s == -jnp.inf, -1, i)
    return jnp.concatenate([jax.lax.bitcast_convert_type(s, jnp.int32), i], axis=1)


def _pack_head_pairs(head_pairs, nqc_pad):
    """[(slot, val)] per query -> (nqc_pad, W) i32/-1 + f32 arrays, W on a
    pow2 ladder so jit shapes are reused."""
    wmax = max((len(hp) for hp in head_pairs), default=0)
    W = 8
    while W < wmax:
        W *= 2
    qh_idx = np.full((nqc_pad, W), -1, np.int32)
    qh_val = np.zeros((nqc_pad, W), np.float32)
    for ci, hp in enumerate(head_pairs):
        for j, (slot, v) in enumerate(hp):
            qh_idx[ci, j] = slot
            qh_val[ci, j] = v
    return qh_idx, qh_val


def _upload_head_pairs(qh_idx, qh_val):
    """ONE h2d for both arrays (bitcast-packed)."""
    packed = np.concatenate([qh_idx.reshape(-1), qh_val.reshape(-1).view(np.int32)])
    dev = jax.device_put(packed)
    n = qh_idx.size
    return (
        dev[:n].reshape(qh_idx.shape),
        jax.lax.bitcast_convert_type(dev[n:].reshape(qh_val.shape), jnp.float32),
    )


def sparse_search_hybrid(
    h: HybridSlab,
    slab_dev: jax.Array,  # (F, nb_pad) f32 (metric-transformed)
    tail_vals_dev: jax.Array,  # (nnz_t,) f32 (metric-transformed)
    tail_doc_ids_dev: jax.Array,
    q_rows: List[Dict[int, float]],
    k: int,
    drop_ratio_search: float = 0.0,
    mask: Optional[jax.Array] = None,  # (>=nb,) bool device or None
    cancel_check=None,
    tail_bits: int = 0,  # >0: tail_doc_ids_dev is a pack_fixed u32 stream
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact head-matmul + tail-scatter scan. ((nq,k) f32, (nq,k) i64 ids)."""
    nq = len(q_rows)
    kk = min(k, h.nb)
    out_s = np.full((nq, k), -np.inf, np.float32)
    out_i = np.full((nq, k), -1, np.int64)
    maskf = None
    if mask is not None:
        mf = jnp.zeros(h.nb_pad, jnp.float32)
        maskf = mf.at[: mask.shape[0]].set(mask.astype(jnp.float32))
    q_chunk = 256
    for s0 in range(0, nq, q_chunk):
        if cancel_check is not None:
            cancel_check()
        e0 = min(s0 + q_chunk, nq)
        nqc_pad = _nqc_ladder(e0 - s0)
        head_pairs = []  # per-query [(slot, val)] -- densified ON DEVICE
        entry_list, qid_list, w_list = [], [], []
        for ci, qi in enumerate(range(s0, e0)):
            hp = []
            for d, v in _drop_items(q_rows[qi], drop_ratio_search):
                slot = h.head_map.get(int(d))
                if slot is not None:
                    hp.append((slot, v))
                    continue
                rng = h.tail.dim_start.get(int(d))
                if rng is None:
                    continue
                st, en = rng
                entry_list.append(np.arange(st, en, dtype=np.int32))
                qid_list.append(np.full(en - st, ci, np.int32))
                w_list.append(np.full(en - st, v, np.float32))
            head_pairs.append(hp)
        qh_idx, qh_val = _pack_head_pairs(head_pairs, nqc_pad)
        has_tail = bool(entry_list)
        if has_tail:
            entry_idx = np.concatenate(entry_list)
            qids = np.concatenate(qid_list)
            ws = np.concatenate(w_list)
            U = entry_idx.size
            P = 1024
            while P < U:
                P *= 2
            if P != U:
                entry_idx = np.concatenate([entry_idx, np.zeros(P - U, np.int32)])
                qids = np.concatenate([qids, np.zeros(P - U, np.int32)])
                ws = np.concatenate([ws, np.zeros(P - U, np.float32)])
            packed_h = np.concatenate([entry_idx, qids, ws.view(np.int32)])
            packed_dev = jax.device_put(packed_h)
            e_dev = packed_dev[:P]
            q_dev = packed_dev[P : 2 * P]
            w_dev = jax.lax.bitcast_convert_type(packed_dev[2 * P :], jnp.float32)
        else:
            e_dev = q_dev = jnp.zeros((1,), jnp.int32)
            w_dev = jnp.zeros((1,), jnp.float32)
        qi_dev, qv_dev = _upload_head_pairs(qh_idx, qh_val)
        packed = _hybrid_topk_kernel(
            slab_dev, tail_doc_ids_dev, tail_vals_dev,
            qi_dev, qv_dev, e_dev, q_dev, w_dev,
            maskf if maskf is not None else jnp.zeros((), jnp.float32),
            k=kk, has_mask=maskf is not None, has_tail=has_tail,
            tail_bits=tail_bits,
        )
        packed_np = np.asarray(packed)[: e0 - s0]
        out_s[s0:e0, :kk] = np.ascontiguousarray(packed_np[:, :kk]).view(np.float32)
        out_i[s0:e0, :kk] = packed_np[:, kk:].astype(np.int64)
    return out_s, out_i


@partial(jax.jit, static_argnames=("has_mask", "has_tail", "tail_bits"))
def _hybrid_full_kernel(
    slab, tail_doc_ids, tail_vals, qh_idx, qh_val, entry_idx, qid, w, maskf,
    *, has_mask: bool, has_tail: bool, tail_bits: int = 0,
):
    Qh = _densify_head(slab, qh_idx, qh_val)
    scores = jax.lax.dot_general(
        Qh, slab, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    if has_tail:
        # same packed-id decode-on-gather as _hybrid_topk_kernel
        if tail_bits:
            from .bitpack import unpack_gather

            docs = unpack_gather(tail_doc_ids, entry_idx, tail_bits).astype(jnp.int32)
        else:
            docs = jnp.take(tail_doc_ids, entry_idx).astype(jnp.int32)
        contrib = w * jnp.take(tail_vals, entry_idx).astype(jnp.float32)
        scores = scores.at[qid, docs].add(contrib)
    if has_mask:
        scores = jnp.where(maskf[None, :] > 0, scores, -jnp.inf)
    return jnp.where(scores > 0, scores, -jnp.inf)


def sparse_full_scores_hybrid(
    h: HybridSlab,
    slab_dev: jax.Array,
    tail_vals_dev: jax.Array,
    tail_doc_ids_dev: jax.Array,
    q_rows: List[Dict[int, float]],
    drop_ratio_search: float = 0.0,
    mask: Optional[jax.Array] = None,
    cancel_check=None,
    tail_bits: int = 0,  # >0: tail_doc_ids_dev is a pack_fixed u32 stream
) -> np.ndarray:
    """Exact (nq, nb) scores via the head/tail split, -inf = no overlap."""
    nq = len(q_rows)
    out = np.full((nq, h.nb), -np.inf, np.float32)
    maskf = None
    if mask is not None:
        mf = jnp.zeros(h.nb_pad, jnp.float32)
        maskf = mf.at[: mask.shape[0]].set(mask.astype(jnp.float32))
    q_chunk = min(256, max(16, (256 << 20) // max(h.nb_pad * 4, 1)))
    for s0 in range(0, nq, q_chunk):
        if cancel_check is not None:
            cancel_check()
        e0 = min(s0 + q_chunk, nq)
        nqc_pad = _nqc_ladder(e0 - s0)
        head_pairs = []  # per-query [(slot, val)] -- densified ON DEVICE
        entry_list, qid_list, w_list = [], [], []
        for ci, qi in enumerate(range(s0, e0)):
            hp = []
            for d, v in _drop_items(q_rows[qi], drop_ratio_search):
                slot = h.head_map.get(int(d))
                if slot is not None:
                    hp.append((slot, v))
                    continue
                rng = h.tail.dim_start.get(int(d))
                if rng is None:
                    continue
                st, en = rng
                entry_list.append(np.arange(st, en, dtype=np.int32))
                qid_list.append(np.full(en - st, ci, np.int32))
                w_list.append(np.full(en - st, v, np.float32))
            head_pairs.append(hp)
        qh_idx, qh_val = _pack_head_pairs(head_pairs, nqc_pad)
        has_tail = bool(entry_list)
        if has_tail:
            entry_idx = np.concatenate(entry_list)
            qids = np.concatenate(qid_list)
            ws = np.concatenate(w_list)
            U = entry_idx.size
            P = 1024
            while P < U:
                P *= 2
            if P != U:
                entry_idx = np.concatenate([entry_idx, np.zeros(P - U, np.int32)])
                qids = np.concatenate([qids, np.zeros(P - U, np.int32)])
                ws = np.concatenate([ws, np.zeros(P - U, np.float32)])
            packed_h = np.concatenate([entry_idx, qids, ws.view(np.int32)])
            packed_dev = jax.device_put(packed_h)
            e_dev, q_dev = packed_dev[:P], packed_dev[P : 2 * P]
            w_dev = jax.lax.bitcast_convert_type(packed_dev[2 * P :], jnp.float32)
        else:
            e_dev = q_dev = jnp.zeros((1,), jnp.int32)
            w_dev = jnp.zeros((1,), jnp.float32)
        qi_dev, qv_dev = _upload_head_pairs(qh_idx, qh_val)
        scores = _hybrid_full_kernel(
            slab_dev, tail_doc_ids_dev, tail_vals_dev,
            qi_dev, qv_dev, e_dev, q_dev, w_dev,
            maskf if maskf is not None else jnp.zeros((), jnp.float32),
            has_mask=maskf is not None, has_tail=has_tail,
            tail_bits=tail_bits,
        )
        out[s0:e0] = np.asarray(scores)[: e0 - s0, : h.nb]
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


# ---------------------------------------------------------------------------
# Windowed pruned search — the DAAT WAND/MaxScore/BlockMax/SINDI analog.
#
# The reference prunes doc-at-a-time with per-dim max scores
# (searcher/daat_wand.h, block_max_wand.h) or processes fixed windows of docs
# (sindi_inverted_index.h, window_size_). The TPU formulation: partition the
# doc axis into windows of `sindi_window_size` docs, precompute per-dim
# per-window posting maxima (the block-max structure, block_max_data.h), and
# per query scan only windows whose score upper bound
#     U[w] = dim_max_score_ratio * sum_t q_t * window_max[t][w]
# can reach the running top-k threshold. Scanned windows are scored EXACTLY
# by the same batched scatter-add kernel, so with dim_max_score_ratio >= 1
# and drop_ratio_search == 0 the result equals the exhaustive scan; ratio < 1
# prunes more aggressively (faster, possible recall loss) exactly as the
# reference documents (sparse_index_config.h:97-126).
# ---------------------------------------------------------------------------


@dataclass
class WindowMaxData:
    """Per-dim per-window posting maxima + entry spans (block-max data)."""

    W: int  # docs per window (clamped [1024, 65535], sparse_index_config.h:158-162)
    n_windows: int
    # dim -> (window ids asc, window max val, entry start, entry end)
    per_dim: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]


def build_window_max(
    postings: SparsePostings, vals_host: np.ndarray, window_size: int
) -> WindowMaxData:
    W = int(np.clip(window_size, 1024, 65535))
    n_windows = max(1, -(-postings.nb // W))
    per_dim: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = {}
    for d, (s, e) in postings.dim_start.items():
        wins = postings.doc_ids[s:e].astype(np.int64) // W  # docs ascend within a dim
        uwin, starts = np.unique(wins, return_index=True)
        ends = np.append(starts[1:], e - s)
        v = vals_host[s:e]
        wmax = np.maximum.reduceat(v, starts).astype(np.float32) if v.size else np.empty(0, np.float32)
        per_dim[int(d)] = (
            uwin.astype(np.int64), wmax,
            (starts + s).astype(np.int64), (ends + s).astype(np.int64),
        )
    return WindowMaxData(W, n_windows, per_dim)


def _concat_ranges(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenated [starts[i], ends[i]) ranges as one int32 index array."""
    lens = (ends - starts).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int32)
    ex = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return (np.repeat(starts - ex, lens) + np.arange(total, dtype=np.int64)).astype(np.int32)


def _drop_items(row, drop_ratio_search: float):
    items = list(row.items()) if isinstance(row, dict) else list(zip(*row))
    if drop_ratio_search > 0 and items:
        absvals = np.abs(np.asarray([v for _, v in items], np.float32))
        thresh = np.quantile(absvals, drop_ratio_search)
        items = [(d, v) for d, v in items if abs(v) >= thresh]
    return items


def _entries_for_windows(wm: WindowMaxData, items, wsel: np.ndarray):
    """Entry index array for a query's terms restricted to selected windows."""
    parts, wparts = [], []
    for d, v in items:
        slot = wm.per_dim.get(int(d))
        if slot is None:
            continue
        uwin, _, st, en = slot
        pick = wsel[uwin]
        if pick.any():
            idx = _concat_ranges(st[pick], en[pick])
            parts.append(idx)
            wparts.append(np.full(idx.size, v, np.float32))
    if not parts:
        return None
    return np.concatenate(parts), np.concatenate(wparts)


def _device_topk(doc_ids_dev, vals_dev, entry_idx, qids, ws, mask, nqc, nb, k):
    """One packed scatter-add + top-k device call (pads U to a pow2 ladder)."""
    U = entry_idx.size
    P = 1024
    while P < U:
        P *= 2
    if P != U:
        entry_idx = np.concatenate([entry_idx, np.zeros(P - U, np.int32)])
        qids = np.concatenate([qids, np.zeros(P - U, np.int32)])
        ws = np.concatenate([ws, np.zeros(P - U, np.float32)])
    packed_h = np.concatenate([entry_idx, qids, ws.view(np.int32)])
    packed_dev = jax.device_put(packed_h)
    packed = _score_and_topk(
        doc_ids_dev, vals_dev,
        packed_dev[:P], packed_dev[P : 2 * P],
        jax.lax.bitcast_convert_type(packed_dev[2 * P :], jnp.float32),
        mask, nqc=nqc, nb=nb, k=k,
    )
    packed_np = np.asarray(packed)
    s = np.ascontiguousarray(packed_np[:, :k]).view(np.float32)
    i = packed_np[:, k:].astype(np.int64)
    return s, i


def exact_rescore_pool(
    csr: Tuple[np.ndarray, np.ndarray, np.ndarray],
    q_rows,
    cand_ids: np.ndarray,  # (nq, pool) int64, -1 padded
    k: int,
    bm25: Optional[Tuple[float, float, float, np.ndarray]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Rescore each query's candidate pool EXACTLY with the full query against
    the row-major CSR, return the top-k (reference refine pass,
    sparse_index_config.h:84-96). For metric=BM25 pass (k1, b, avgdl,
    row_sums): the CSR stores raw term frequencies, so the rescore applies the
    BM25 doc-value transform per entry — otherwise the pool would be ranked by
    raw inner product (round-2 advisor finding)."""
    indptr, indices, values = csr
    nq = len(q_rows)
    out_s = np.full((nq, k), -np.inf, np.float32)
    out_i = np.full((nq, k), -1, np.int64)
    if bm25 is not None:
        k1, b, avgdl, row_sums = bm25
        avgdl = max(avgdl, 1e-9)
    for ci in range(nq):
        row = q_rows[ci]
        qitems = sorted(row.items()) if isinstance(row, dict) else sorted(zip(*row))
        if not qitems:
            continue
        qd = np.asarray([d for d, _ in qitems], np.int64)
        qw = np.asarray([w for _, w in qitems], np.float32)
        cand = cand_ids[ci][cand_ids[ci] >= 0]
        if cand.size == 0:
            continue
        st = indptr[cand]
        en = indptr[cand + 1]
        eidx = _concat_ranges(st, en)
        owner = np.repeat(np.arange(cand.size), (en - st))
        dims_c = indices[eidx]
        pos = np.searchsorted(qd, dims_c)
        pos_c = np.clip(pos, 0, qd.size - 1)
        hit = qd[pos_c] == dims_c
        doc_vals = values[eidx]
        if bm25 is not None:
            dl = row_sums[cand[owner]]
            doc_vals = doc_vals * (k1 + 1.0) / (
                doc_vals + k1 * (1.0 - b + b * dl / avgdl)
            )
        contrib = np.where(hit, doc_vals * qw[pos_c], 0.0)
        sc = np.zeros(cand.size, np.float32)
        np.add.at(sc, owner, contrib)
        order = np.argsort(-sc, kind="stable")[:k]
        nres = order.size
        out_s[ci, :nres] = sc[order]
        out_i[ci, :nres] = cand[order]
    return out_s, out_i


def sparse_search_pruned(
    postings: SparsePostings,
    vals_dev: jax.Array,
    doc_ids_dev: jax.Array,
    q_rows: List[Dict[int, float]],
    k: int,
    *,
    wmax: WindowMaxData,
    refine_factor: int = 1,
    dim_max_score_ratio: float = 1.05,
    drop_ratio_search: float = 0.0,
    mask: Optional[jax.Array] = None,
    csr: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    stats: Optional[dict] = None,
    bm25: Optional[Tuple[float, float, float, np.ndarray]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Window-pruned scoring: per query, scan only windows whose upper bound
    reaches the running threshold; refine_factor widens the first pass and
    (with drop_ratio_search > 0) triggers an exact full-query rescore of the
    top refine_factor*k candidates against the row-major CSR."""
    nq = len(q_rows)
    nb = postings.nb
    nw = wmax.n_windows
    rf = max(int(refine_factor), 1)
    ratio = float(dim_max_score_ratio)
    k_out = min(max(k * rf, k), nb)
    out_s = np.full((nq, k), -np.inf, np.float32)
    out_i = np.full((nq, k), -1, np.int64)
    q_chunk = min(256, max(16, (128 << 20) // max(nb * 4, 1)))
    n_scanned_a = n_scanned_b = 0
    from ..comp import check_current_cancellation

    for s0 in range(0, nq, q_chunk):
        check_current_cancellation()
        e0 = min(s0 + q_chunk, nq)
        nqc = e0 - s0
        chunk_items = [_drop_items(q_rows[qi], drop_ratio_search) for qi in range(s0, e0)]
        bounds = np.zeros((nqc, nw), np.float32)
        for ci, items in enumerate(chunk_items):
            for d, v in items:
                slot = wmax.per_dim.get(int(d))
                if slot is not None:
                    bounds[ci, slot[0]] += v * slot[1]
        bounds *= ratio

        # phase A: top-bound windows with capacity for the refine pool
        n_sel = min(nw, max(1, -(-max(4 * k_out, 2048) // wmax.W)))
        selA = np.argsort(-bounds, axis=1, kind="stable")[:, :n_sel]
        eparts, qparts, wparts = [], [], []
        wselA = np.zeros((nqc, nw), bool)
        for ci, items in enumerate(chunk_items):
            sel = selA[ci][bounds[ci, selA[ci]] > 0]
            if sel.size == 0:
                continue
            wselA[ci, sel] = True
            got = _entries_for_windows(wmax, items, wselA[ci])
            if got is None:
                continue
            idx, ws_ = got
            eparts.append(idx)
            qparts.append(np.full(idx.size, ci, np.int32))
            wparts.append(ws_)
        n_scanned_a += int(wselA.sum())
        if not eparts:
            continue
        sA, iA = _device_topk(
            doc_ids_dev, vals_dev,
            np.concatenate(eparts), np.concatenate(qparts), np.concatenate(wparts),
            mask, nqc, nb, min(k_out, nb),
        )

        # phase B: remaining windows whose bound reaches the phase-A
        # threshold. The threshold is the POOL's k_out-th score (not the
        # k-th): with refine_factor > 1 the refine pass reorders the pool, so
        # the bound guarantee must hold for the whole pool.
        kth = sA[:, min(k_out, sA.shape[1]) - 1].copy()
        kth[~np.isfinite(kth)] = -np.inf
        need_b = (bounds >= kth[:, None]) & ~wselA & (bounds > 0)
        sB = iB = None
        if need_b.any():
            eparts, qparts, wparts = [], [], []
            for ci, items in enumerate(chunk_items):
                if not need_b[ci].any():
                    continue
                got = _entries_for_windows(wmax, items, need_b[ci])
                if got is None:
                    continue
                idx, ws_ = got
                eparts.append(idx)
                qparts.append(np.full(idx.size, ci, np.int32))
                wparts.append(ws_)
            n_scanned_b += int(need_b.sum())
            if eparts:
                sB, iB = _device_topk(
                    doc_ids_dev, vals_dev,
                    np.concatenate(eparts), np.concatenate(qparts), np.concatenate(wparts),
                    mask, nqc, nb, min(k_out, nb),
                )
        if sB is not None:
            cat_s = np.concatenate([sA, sB], axis=1)
            cat_i = np.concatenate([iA, iB], axis=1)
            key = np.where(cat_i >= 0, cat_s, -np.inf)
            order = np.argsort(-key, axis=1, kind="stable")[:, :k_out]
            sA = np.take_along_axis(cat_s, order, 1)
            iA = np.take_along_axis(cat_i, order, 1)

        # refine: exact full-query rescore of the candidate pool (only the
        # query-term drop made scores approximate; window scans are exact)
        if rf > 1 and drop_ratio_search > 0 and csr is not None:
            rs, ri = exact_rescore_pool(csr, q_rows[s0:e0], iA.astype(np.int64), k, bm25=bm25)
            out_s[s0:e0] = rs
            out_i[s0:e0] = ri
            continue
        kk = min(k, sA.shape[1])
        out_s[s0:e0, :kk] = sA[:, :kk]
        out_i[s0:e0, :kk] = iA[:, :kk]
    if stats is not None:
        stats["windows_scanned_a"] = n_scanned_a
        stats["windows_scanned_b"] = n_scanned_b
        stats["windows_total"] = nq * nw
        stats["n_windows"] = nw
        stats["window_size"] = wmax.W
    return out_s, out_i
