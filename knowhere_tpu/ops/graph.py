"""Graph ANN engine: kNN-graph construction + batched beam search.

Functional replacement for the reference's HNSW machinery
(reference: thirdparty/faiss/.../impl/HNSW.cpp level-graph build,
impl/HnswSearcher.h v2_hnsw_searcher greedy+best-first walk,
IndexHNSWWrapper.cc:71-194 bitset-filtered search) — re-designed for TPU:

- BUILD is not sequential per-insert. A high-degree approximate kNN graph is
  computed with the batched IVF/flat kNN engines (every vector is a query —
  one giant MXU job), then pruned per node with the SAME diversification rule
  HNSW/Vamana use (select_neighbors_heuristic / RobustPrune with alpha):
  vectorized over node chunks, the greedy keep/drop loop runs as a
  lax.fori_loop over candidate ranks. Reverse edges backfill spare slots.
  This is the CAGRA-style flat graph: equal search quality at equal degree,
  build is batched matmuls instead of a lock-striped insert loop.

- SEARCH is batched best-first beam search: per query a beam of ef
  candidates; each step expands the best unexpanded node, gathers its <=deg
  neighbors, dedupes against an EXACT per-query visited ring (broadcast
  equality on the VPU — the reference uses per-thread visited lists), scores
  them (gather + VPU), and merges into the beam with top_k. The whole loop is
  one lax.while_loop under jit — queries run as a device batch, replacing the
  reference's per-query thread fan-out. Filtered-out nodes ARE traversed but
  never surface as results (two top-k sets), matching the reference's filter
  semantics (hnswalg.h:436-473).

  Visited-set design note: an earlier lossy hash table needed one scalar
  GATHER and one scalar SCATTER over a (nq, 2^bits) table per step — random
  access runs at ~100M elems/s on v5e, making the table ~2x the cost of the
  neighbor-vector gather itself. The ring compares every candidate against
  all previously-scored ids with one fused (nq, G, V) equality-reduce: pure
  VPU throughput, ~10x cheaper at serving ef, and exact (no collision-driven
  duplicate results — the hash path's recall inversion at high ef is gone by
  construction).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -float("inf")


# ---------------------------------------------------------------------------
# Build: batched kNN graph + heuristic prune
# ---------------------------------------------------------------------------


def _approx_knn_graph(
    x: np.ndarray,
    k: int,
    metric: str,
    centroids: Optional[np.ndarray] = None,
    assign: Optional[np.ndarray] = None,
    x_dev: Optional[jax.Array] = None,
) -> np.ndarray:
    """(nb, k) neighbor ids (self excluded) via batched exact/IVF kNN."""
    from . import topk as T
    from . import distances as D
    from .kmeans import kmeans, assign_rows
    from .ivf_scan import coarse_probe, ivf_scan_search

    nb, d = x.shape
    metric = metric.upper()
    if nb <= 65536:
        base_dev = jax.device_put(x)
        aux = D.base_aux(metric, base_dev)
        ids, _ = T.knn_search(x, base_dev, k + 1, metric, aux=aux, query_chunk=4096)
    else:
        # IVF-accelerated all-pairs kNN: cluster, then probe a few lists.
        # Lists pad to LIST_ALIGN multiples so the scan rides the Pallas
        # raw kernel (the compact layout fell back to the XLA task scan —
        # measured 160s of a 194s 1M build in that fallback).
        from .ivf_pallas import LIST_ALIGN

        # pow2 ladder: sqrt(nb) directly would give every corpus size its
        # own kernel shapes (first compile costs minutes on this platform)
        nlist = 1 << int(round(np.log2(max(64, int(np.sqrt(nb))))))
        if centroids is None or centroids.shape[0] != nlist:
            centroids, assign = kmeans(x, nlist, n_iters=8)
        elif assign is None:
            assign = assign_rows(x, centroids)
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=nlist).astype(np.int64)
        align = LIST_ALIGN if d % 128 == 0 else 0
        pad_counts = (
            (counts + align - 1) // align * align if align else counts
        )
        offsets = np.zeros(nlist + 1, np.int64)
        np.cumsum(pad_counts, out=offsets[1:])
        nb_pad = int(offsets[-1])
        true_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        dst = np.arange(nb, dtype=np.int64) + np.repeat(
            offsets[:-1] - true_starts, counts
        )
        row_ids = np.full(nb_pad, -1, dtype=np.int64)
        row_ids[dst] = order
        x_sorted = np.zeros((nb_pad, d), np.float32)
        x_sorted[dst] = x[order]
        pad = np.zeros((2048, d), np.float32)
        store = {
            "data": jax.device_put(np.concatenate([x_sorted, pad])),
            "norms": jax.device_put(
                np.concatenate(
                    [
                        np.sum(x_sorted.astype(np.float64) ** 2, 1).astype(np.float32),
                        np.zeros(2048, np.float32),
                    ]
                )
            ),
            "centroids": jax.device_put(centroids),
        }
        is_l2 = metric == "L2"
        ids = np.empty((nb, k + 1), dtype=np.int64)
        # query chunks SLICE the resident corpus (zero h2d per chunk; the old
        # per-chunk upload cost ~160ms + probes synced to host + host task
        # build — ~60% of a 1M build); probes stay on device and the task
        # build runs on device too (build_scan_tasks_jax)
        chunk = 32768
        if x_dev is None:
            x_dev = jax.device_put(x.astype(np.float32))
        from .ivf_scan import pack_results, unpack_results

        packed_chunks = []
        spans = []
        for s in range(0, nb, chunk):
            e = min(s + chunk, nb)
            q_dev = x_dev[s:e]
            probes = coarse_probe(q_dev, store["centroids"], nprobe=12, is_l2=is_l2)
            sc, pos = ivf_scan_search(
                q_dev, store, "raw", probes, offsets, k + 1, is_l2,
                list_lengths=counts, return_device=True,
            )
            packed_chunks.append(pack_results(sc, pos))  # async across chunks
            spans.append((s, e))
        for (s, e), pk in zip(spans, packed_chunks):
            _, pos = unpack_results(np.asarray(pk))
            ids[s:e] = np.where(
                pos >= 0, row_ids[np.clip(pos, 0, nb_pad - 1)], -1
            )
    # drop self edges (vectorized: stable-sort self-hits to the end, cut to k)
    ids = np.asarray(ids, dtype=np.int64)
    is_self = ids == np.arange(nb, dtype=np.int64)[:, None]
    order = np.argsort(is_self, axis=1, kind="stable")
    cleaned = np.take_along_axis(ids, order, axis=1)
    cleaned = np.where(np.take_along_axis(is_self, order, axis=1), -1, cleaned)
    return cleaned[:, :k].astype(np.int32)


@partial(jax.jit, static_argnames=("deg", "is_l2", "alpha"))
def _prune_chunk(
    x_all: jax.Array,  # (nb, d) device-resident base
    cand_ids: jax.Array,  # (C, K)
    start: jax.Array,  # () int32 — first node of the chunk
    *,
    deg: int,
    is_l2: bool,
    alpha: float = 1.0,
) -> jax.Array:
    """HNSW select_neighbors_heuristic / Vamana RobustPrune(alpha),
    vectorized over a chunk of nodes. Candidates must be sorted best-first.
    alpha > 1 (DiskANN) keeps more long-range edges. Node/candidate vectors
    are gathered ON DEVICE from the resident base (a host-side gather ships
    C*K*d floats through the interconnect per chunk — 65GB for a 1M build)."""
    C, K = cand_ids.shape
    d = x_all.shape[1]
    x_nodes = jax.lax.dynamic_slice(x_all, (start, 0), (C, d))
    cand_vecs = jnp.take(x_all, jnp.clip(cand_ids, 0), axis=0)  # (C, K, d)

    hp = jax.lax.Precision.HIGHEST
    if is_l2:
        # matmul identity, NOT broadcast-subtract-square: the elementwise
        # form is (C,K,K,d) VPU work (~400s for a 200k build); the batched
        # einsum lands on the MXU (measured: build-dominating -> ~10s)
        nrm = jnp.sum(cand_vecs**2, axis=-1)  # (C, K)
        dots = jnp.einsum(
            "ckd,cjd->ckj", cand_vecs, cand_vecs,
            preferred_element_type=jnp.float32, precision=hp,
        )
        pair = jnp.maximum(nrm[:, :, None] + nrm[:, None, :] - 2.0 * dots, 0.0)
        nd = jnp.einsum(
            "cd,ckd->ck", x_nodes, cand_vecs,
            preferred_element_type=jnp.float32, precision=hp,
        )
        d_node = jnp.maximum(
            jnp.sum(x_nodes**2, -1)[:, None] + nrm - 2.0 * nd, 0.0
        )
    else:  # similarity: "closer" = larger; diversification uses similarity
        d_node = -jnp.einsum(
            "cd,ckd->ck", x_nodes, cand_vecs,
            preferred_element_type=jnp.float32, precision=hp,
        )
        pair = -jnp.einsum(
            "ckd,cjd->ckj", cand_vecs, cand_vecs,
            preferred_element_type=jnp.float32, precision=hp,
        )

    valid = cand_ids >= 0

    def body(j, kept):
        # keep candidate j iff for all kept s: alpha * pair[j, s] >= d_node[j]
        conflict = kept & (alpha * pair[:, j, :] < d_node[:, j][:, None])  # (C,K)
        ok = ~jnp.any(conflict, axis=1) & valid[:, j]
        ok &= jnp.sum(kept, axis=1) < deg
        return kept.at[:, j].set(ok)

    kept = jax.lax.fori_loop(0, K, body, jnp.zeros((C, K), dtype=bool))
    # compact kept ids into (C, deg)
    key = jnp.where(kept, jnp.arange(K)[None, :], K + 1)
    order = jnp.argsort(key, axis=1)[:, :deg]
    sel_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    sel_valid = jnp.take_along_axis(kept, order, axis=1)
    return jnp.where(sel_valid, sel_ids, -1)


@partial(jax.jit, static_argnames=("deg", "is_l2", "alpha"))
def prune_candidates_ids(
    x_all: jax.Array,  # (nb, d) device-resident base (old + new rows)
    cand_ids: jax.Array,  # (C, K) candidate pool, -1 padded, may hold dups
    node_ids: jax.Array,  # (C,) the nodes being (re)pruned
    *,
    deg: int,
    is_l2: bool,
    alpha: float = 1.0,
) -> jax.Array:
    """`_prune_chunk` for a NON-CONTIGUOUS node set with an UNSORTED candidate
    pool — the incremental-insert path (new-node neighbor selection and
    reverse-edge repair of touched old nodes; hnswlib analog:
    mutuallyConnectNewElement's getNeighborsByHeuristic2 re-prune,
    thirdparty/hnswlib/hnswlib/hnswalg.h). Node vectors gather by id;
    candidates are distance-sorted and deduped in-function."""
    C, K = cand_ids.shape
    x_nodes = jnp.take(x_all, jnp.clip(node_ids, 0), axis=0)  # (C, d)
    cand_vecs = jnp.take(x_all, jnp.clip(cand_ids, 0), axis=0)  # (C, K, d)

    hp = jax.lax.Precision.HIGHEST
    if is_l2:
        nd = jnp.einsum(
            "cd,ckd->ck", x_nodes, cand_vecs,
            preferred_element_type=jnp.float32, precision=hp,
        )
        d_node = jnp.maximum(
            jnp.sum(x_nodes**2, -1)[:, None]
            + jnp.sum(cand_vecs**2, -1) - 2.0 * nd,
            0.0,
        )
    else:
        d_node = -jnp.einsum(
            "cd,ckd->ck", x_nodes, cand_vecs,
            preferred_element_type=jnp.float32, precision=hp,
        )

    BIG = jnp.float32(3.0e38)
    valid = (cand_ids >= 0) & (cand_ids != node_ids[:, None])
    key = jnp.where(valid, d_node, BIG)
    order = jnp.argsort(key, axis=1)
    cid = jnp.take_along_axis(cand_ids, order, axis=1)
    cvecs = jnp.take_along_axis(cand_vecs, order[:, :, None], axis=1)
    dn = jnp.take_along_axis(key, order, axis=1)
    vv = jnp.take_along_axis(valid, order, axis=1)
    # dedup: a candidate may arrive from both the old adjacency and the
    # incoming reverse edges — keep its best-ranked occurrence
    tri = jnp.arange(K)[None, :, None] > jnp.arange(K)[None, None, :]
    dup = jnp.any((cid[:, :, None] == cid[:, None, :]) & tri, axis=2)
    vv &= ~dup

    if is_l2:
        nrm2 = jnp.sum(cvecs**2, axis=-1)
        dots2 = jnp.einsum(
            "ckd,cjd->ckj", cvecs, cvecs,
            preferred_element_type=jnp.float32, precision=hp,
        )
        pair = jnp.maximum(nrm2[:, :, None] + nrm2[:, None, :] - 2.0 * dots2, 0.0)
    else:
        pair = -jnp.einsum(
            "ckd,cjd->ckj", cvecs, cvecs,
            preferred_element_type=jnp.float32, precision=hp,
        )

    def body(j, kept):
        conflict = kept & (alpha * pair[:, j, :] < dn[:, j][:, None])
        ok = ~jnp.any(conflict, axis=1) & vv[:, j]
        ok &= jnp.sum(kept, axis=1) < deg
        return kept.at[:, j].set(ok)

    kept = jax.lax.fori_loop(0, K, body, jnp.zeros((C, K), dtype=bool))
    key2 = jnp.where(kept, jnp.arange(K)[None, :], K + 1)
    order2 = jnp.argsort(key2, axis=1)[:, :deg]
    sel_ids = jnp.take_along_axis(cid, order2, axis=1)
    sel_valid = jnp.take_along_axis(kept, order2, axis=1)
    return jnp.where(sel_valid, sel_ids, -1)


def build_graph(
    x: np.ndarray,
    deg: int,
    metric: str,
    intermediate_deg: Optional[int] = None,
    add_reverse: bool = True,
    alpha: float = 1.0,
    n_long_edges: int = 2,
    centroids: Optional[np.ndarray] = None,
    assign: Optional[np.ndarray] = None,
    x_dev: Optional[jax.Array] = None,
) -> np.ndarray:
    """Returns (nb, deg) int32 adjacency (-1 padded).

    `n_long_edges` slots per node hold RANDOM long-range edges (NSW-style
    small-world shortcuts). The HNSW hierarchy / sequential-insert order
    produces such links implicitly; a batched flat build must add them
    explicitly or multi-modal corpora split into disconnected components
    (observed: recall 0.06 on a 500-cluster 1M corpus without them)."""
    import os
    import time as _time

    timing = os.environ.get("KNOWHERE_BUILD_TIMING") == "1"
    t0 = _time.time()

    def _mark(phase):
        nonlocal t0
        if timing:
            now = _time.time()
            print(f"[build_graph] {phase}: {now - t0:.1f}s", flush=True)
            t0 = now

    nb, d = x.shape
    inter = intermediate_deg or min(max(2 * deg, 32), max(nb - 1, 1))
    inter = min(inter, nb - 1)
    if x_dev is None:  # resident once; ALL build phases slice/gather from it
        # (a 512MB corpus upload costs ~5-30s through the tunnel)
        x_dev = jax.device_put(x.astype(np.float32))
    knn = _approx_knn_graph(
        x, inter, metric, centroids=centroids, assign=assign, x_dev=x_dev
    )
    _mark("approx-knn")
    is_l2 = metric.upper() != "IP"  # cosine data comes pre-normalized; L2 rule ok

    graph = np.full((nb, deg), -1, dtype=np.int32)
    # chunk sized by the prune's (chunk, K, K) pair matrix + (chunk, K, d)
    # gathers (~512MB transient); bigger chunks = fewer dispatches (~20ms
    # flat each over the tunnel)
    K_c = knn.shape[1]
    chunk = min(nb, max(1024, int((256 << 20) // max(K_c * (K_c + d) * 4, 1)) // 512 * 512))
    # the kNN table uploads ONCE and chunks slice it on device: the old
    # per-chunk device_put paid ~25-50ms x nb/2048 chunks (~20s of a 1M build)
    knn_dev = jax.device_put(np.ascontiguousarray(knn))
    starts = list(range(0, max(nb - chunk, 0) + 1, chunk))
    if starts[-1] + chunk < nb:
        starts.append(nb - chunk)  # overlapping tail keeps one jit shape
    outs = []
    for s in starts:
        outs.append(
            _prune_chunk(
                x_dev,
                jax.lax.dynamic_slice(knn_dev, (s, 0), (chunk, K_c)),
                jnp.int32(s),
                deg=deg,
                is_l2=is_l2,
                alpha=alpha,
            )
        )
    # one sync for all chunks (each np.asarray costs a ~30ms device round-trip)
    for s, out in zip(starts, np.asarray(jnp.stack(outs))):
        graph[s : s + chunk] = out
    knn_dev.delete()
    _mark("prune")

    if add_reverse:
        # backfill spare slots with reverse edges (connectivity, like HNSW's
        # bidirectional links / Vamana's reverse pass) — fully vectorized:
        # group (src->dst) pairs by dst, rank within group, keep rank < free.
        # Occasional duplicate neighbors are tolerated (the search kernel's
        # visited hash dedupes); they only waste a slot.
        slots_used = (graph >= 0).sum(axis=1)
        src = np.repeat(np.arange(nb, dtype=np.int32), deg)
        dst = graph.reshape(-1)
        ok = (dst >= 0) & (src != dst)
        src, dst = src[ok], dst[ok]
        if dst.size:
            # drop reverse edges that already exist as forward edges of dst
            # (vectorized set-membership on hashed (node, nbr) keys)
            fwd_node = np.repeat(np.arange(nb, dtype=np.int64), deg)
            fwd_nbr = graph.reshape(-1).astype(np.int64)
            fwd_keys = fwd_node[fwd_nbr >= 0] * nb + fwd_nbr[fwd_nbr >= 0]
            rev_keys = dst.astype(np.int64) * nb + src.astype(np.int64)
            fresh = ~np.isin(rev_keys, fwd_keys, kind="sort")
            src, dst = src[fresh], dst[fresh]
        if dst.size:
            order = np.argsort(dst, kind="stable")
            src, dst = src[order], dst[order]
            change = np.empty(dst.size, bool)
            change[0] = True
            change[1:] = dst[1:] != dst[:-1]
            grp_start = np.nonzero(change)[0]
            grp_id = np.cumsum(change) - 1
            rank = np.arange(dst.size) - grp_start[grp_id]
            free = deg - slots_used
            keep = rank < free[dst]
            s2, d2, r2 = src[keep], dst[keep], rank[keep]
            graph[d2, slots_used[d2] + r2] = s2
    _mark("reverse-edges")

    if n_long_edges > 0 and nb > deg * 4:
        # small-world shortcuts: overwrite the LAST n_long_edges slots with
        # random far targets (keeps the best (deg - n_long_edges) pruned
        # neighbors; guarantees inter-cluster connectivity)
        rng = np.random.default_rng(97)
        for j in range(1, min(n_long_edges, deg) + 1):
            targets = rng.integers(0, nb, nb).astype(np.int32)
            targets = np.where(targets == np.arange(nb, dtype=np.int32), (targets + 1) % nb, targets)
            graph[:, deg - j] = targets
    _mark("long-edges")
    return graph


def pick_entry_points(
    x: np.ndarray,
    n_entry: int = 64,
    seed: int = 7,
    centroids: Optional[np.ndarray] = None,
    base_dev: Optional[jax.Array] = None,
) -> np.ndarray:
    """k-means-centroid entry points (replaces the HNSW top-level descent).

    The level hierarchy's job is coarse navigation; on a flat graph the same
    coverage comes from seeding the beam with one real node per k-means
    region — random picks strand whole clusters on multi-modal data. Passing
    `centroids` reuses a clustering already computed by the graph build."""
    nb = x.shape[0]
    n_entry = min(n_entry, nb)
    if nb <= 100_000:
        # small corpora: random entries + long-range edges already give full
        # coverage, and kmeans would dominate test-build time
        rng = np.random.default_rng(seed)
        return np.unique(rng.choice(nb, size=n_entry, replace=nb < n_entry)).astype(np.int32)
    from .kmeans import kmeans
    from . import topk as T

    if centroids is None:
        centroids, _ = kmeans(x, n_entry, n_iters=6, seed=seed)
    import jax as _jax

    if base_dev is None:
        base_dev = _jax.device_put(x.astype(np.float32))
    from . import distances as D

    aux = D.base_aux("L2", base_dev)
    ids, _ = T.knn_search(centroids, base_dev, 1, "L2", aux=aux)
    return np.unique(ids.reshape(-1)).astype(np.int32)


# ---------------------------------------------------------------------------
# Search: batched best-first beam
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "kind", "ef", "k", "deg", "max_iters", "is_l2", "is_jaccard", "has_mask",
        "hash_bits", "prec", "beam_width", "n_seed", "compact_ratio", "ring_cap",
    ),
)
def beam_search(
    q: jax.Array,  # (nq, d) f32
    store: Dict[str, jax.Array],  # 'data' (nb,d) [+codec arrays]
    graph: jax.Array,  # (nb, deg) int32
    entry: jax.Array,  # (E,) int32
    keep_mask: Optional[jax.Array],  # (nb,) bool or None
    *,
    kind: str,
    ef: int,
    k: int,
    deg: int,
    max_iters: int,
    is_l2: bool,
    is_jaccard: bool = False,
    has_mask: bool = False,
    hash_bits: int = 12,
    prec: str = "exact",
    beam_width: int = 1,
    route_cents: Optional[jax.Array] = None,  # (E, d) kmeans centroids
    n_seed: int = 0,
    compact_ratio: float = 1.0,  # <1.0 enables gather compaction (W>1 only)
    ring_cap: int = 256,  # visited-ring slots; smaller = cheaper step, more re-scores
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scores (nq,k) larger-is-better, ids (nq,k) int32, -1 pad)."""
    from .distances import precision_from_name

    mp = precision_from_name(prec)
    nq, d = q.shape
    E = entry.shape[0]

    def decode(ids_flat: jax.Array) -> jax.Array:
        """(N,) node ids -> (N, d) f32 vectors. Quantized decodes run in
        lax.map chunks: the (N, m, sub_dim) gather intermediate lane-pads
        sub_dim up to 128 — a 32x memory blow-up at sub_dim=4 that OOMed
        1M-corpus DiskANN/HNSW_PQ compiles when N = nq*W*deg is large."""
        if kind in ("pq", "prq"):
            CH = 16384
            N = ids_flat.shape[0]
            if N > CH:
                P = (N + CH - 1) // CH * CH
                idsp = jnp.pad(ids_flat, (0, P - N))
                out = jax.lax.map(_decode_core, idsp.reshape(P // CH, CH))
                return out.reshape(P, -1)[:N]
        return _decode_core(ids_flat)

    def _decode_core(ids_flat: jax.Array) -> jax.Array:
        safe = jnp.clip(ids_flat, 0)
        if kind == "raw":
            return jnp.take(store["data"], safe, axis=0).astype(jnp.float32)
        if kind in ("sq", "sq6"):  # byte-grid SQ8 (256 levels) / SQ6 (64)
            levels = 256.0 if kind == "sq" else 64.0
            codes = jnp.take(store["codes"], safe, axis=0).astype(jnp.float32)
            return store["vmin"][None, :] + (codes + 0.5) / levels * store["vdiff"][None, :]
        if kind == "sq4":  # two 4-bit codes per byte
            packed = jnp.take(store["codes"], safe, axis=0)
            lo = (packed & 0xF).astype(jnp.float32)
            hi = (packed >> 4).astype(jnp.float32)
            d = store["vmin"].shape[0]
            q4 = jnp.stack([lo, hi], axis=-1).reshape(packed.shape[0], -1)[:, :d]
            return store["vmin"][None, :] + (q4 + 0.5) / 16.0 * store["vdiff"][None, :]
        if kind == "lvq":  # per-vector grid (SVS LVQ-8 semantics)
            codes = jnp.take(store["codes"], safe, axis=0).astype(jnp.float32)
            off = jnp.take(store["off"], safe)[:, None]
            scale = jnp.take(store["scale"], safe)[:, None]
            return store["mean"][None, :] + off + (codes + 0.5) * scale
        if kind == "pq":
            m = store["codes"].shape[1]
            books = store["codebooks"]
            ksub, sub_dim = books.shape[1], books.shape[2]
            codes = jnp.take(store["codes"], safe, axis=0)
            flat = books.reshape(m * ksub, sub_dim)
            idx = codes.astype(jnp.int32) + (jnp.arange(m, dtype=jnp.int32) * ksub)[None, :]
            return jnp.take(flat, idx, axis=0).reshape(-1, m * sub_dim)
        if kind == "prq":  # product residual quantizer: sum of nrq PQ decodes
            books = store["codebooks"]  # (nrq, m, ksub, sub_dim)
            nrq, m, ksub, sub_dim = books.shape
            codes = jnp.take(store["codes"], safe, axis=0)  # (N, nrq*m)
            acc = None
            for s in range(nrq):
                flat = books[s].reshape(m * ksub, sub_dim)
                cs = codes[:, s * m : (s + 1) * m]
                idx = cs.astype(jnp.int32) + (jnp.arange(m, dtype=jnp.int32) * ksub)[None, :]
                dec = jnp.take(flat, idx, axis=0).reshape(-1, m * sub_dim)
                acc = dec if acc is None else acc + dec
            return acc
        raise ValueError(kind)

    def score_nodes(ids: jax.Array) -> jax.Array:
        """(nq, C) node ids -> (nq, C) larger-is-better scores."""
        C = ids.shape[1]
        vecs = decode(ids.reshape(-1)).reshape(nq, C, d)
        if is_jaccard:
            inter = jnp.einsum(
                "qd,qcd->qc", q, vecs, preferred_element_type=jnp.float32, precision=mp
            )
            q_pop = jnp.sum(q, axis=1, keepdims=True)
            b_pop = jnp.sum(vecs, axis=2)
            union = jnp.maximum(q_pop + b_pop - inter, 1e-9)
            return inter / union
        dots = jnp.einsum("qd,qcd->qc", q, vecs, preferred_element_type=jnp.float32, precision=mp)
        if is_l2:
            vn = jnp.sum(vecs**2, axis=2)
            return 2.0 * dots - vn  # dist = |q|^2 - score
        return dots

    # --- init: entry points ---
    # Per-query k-means routing (the TPU-native replacement for the HNSW
    # hierarchy descent): score the query against the E routing centroids (one
    # matmul, no gathers) and seed the beam with each top centroid's resident
    # node. The legacy path broadcasts ALL global entries into every beam,
    # which costs E gathered rows PER QUERY at init — the dominant gather cost
    # for large entry sets (gathers run at ~90 Mrows/s on v5e regardless of
    # row width; see ops/ivf_pallas.py platform notes).
    if route_cents is not None and n_seed > 0:
        cs = jnp.dot(q, route_cents.T, preferred_element_type=jnp.float32)
        if is_l2:
            cs = 2.0 * cs - jnp.sum(route_cents**2, axis=1)[None, :]
        _, top_c = jax.lax.top_k(cs, min(n_seed, E))
        ids0 = jnp.take(entry, top_c, axis=0).astype(jnp.int32)  # (nq, E')
    else:
        ids0 = jnp.broadcast_to(entry[None, :].astype(jnp.int32), (nq, E))
    E_eff = ids0.shape[1]
    s0 = score_nodes(ids0)

    # beam payload packs (id << 1) | expanded into ONE int32 so every beam
    # merge is a single variadic lax.sort((key, payload), num_keys=1) — the
    # former top_k + 2x take_along_axis pattern cost ~5.4 ms/step in-loop
    # (take_along is ~100M elems/s random access) vs ~0.3 ms for the sort.
    # id -1 is all-ones, so padding is born "expanded" (bit0 = 1) for free.
    # Requires ids < 2^30 (id<<1 must not overflow int32).
    pad = ef - min(ef, E_eff)
    beam_p = jnp.concatenate(
        [ids0[:, : min(ef, E_eff)] << 1, jnp.full((nq, pad), -1, jnp.int32)], axis=1
    )
    beam_s = jnp.concatenate(
        [s0[:, : min(ef, E_eff)], jnp.full((nq, pad), NEG_INF, jnp.float32)], axis=1
    )
    ns0, np0 = jax.lax.sort((-beam_s, beam_p), dimension=1, num_keys=1)
    beam_s, beam_p = -ns0, np0
    beam_ids = beam_p >> 1

    # Recent-window visited ring (see module docstring): each step's scored
    # ids are appended; candidates are deduped with one (nq, G, V) equality-
    # reduce on the VPU instead of random-access hash probes. Capacity is
    # Gc-slot aligned so step offsets cycle without wrap-splitting a write;
    # old entries are overwritten once the ring wraps — a re-scored ancient
    # node only wastes a lane (the in-beam check + final dedup keep results
    # exact), never a correctness issue. Measured (200k corpus, v5e): recall
    # is INVARIANT to ring size down to 128 slots while QPS rises ~40-2x
    # (the (nq, G, V) reduce was the dominant per-step cost at 4096 slots),
    # so the default window is small.
    W = max(1, min(beam_width, ef))
    G_full = W * deg
    if W > 1 and compact_ratio < 1.0:
        Gc = max(deg, int(G_full * compact_ratio) // 8 * 8)
    else:
        Gc = G_full
    n_slots = max(1, min(max_iters, max(ring_cap, Gc) // Gc))
    ring_cap = n_slots * Gc
    visited = jnp.concatenate(
        [ids0, jnp.full((nq, ring_cap), -1, jnp.int32)], axis=1
    )  # (nq, E_eff + ring_cap)

    # result top-k (valid-only)
    if has_mask:
        valid0 = jnp.take(keep_mask, jnp.clip(beam_ids, 0), axis=0) & (beam_ids >= 0)
    else:
        valid0 = beam_ids >= 0
    res_s0 = jnp.where(valid0, beam_s, NEG_INF)
    rs0, rp0 = jax.lax.sort(
        (-res_s0, jnp.where(valid0, beam_ids, -1)), dimension=1, num_keys=1
    )
    res_s, res_ids = -rs0[:, :k], rp0[:, :k]
    res_ids = jnp.where(res_s == NEG_INF, -1, res_ids)

    def cond(state):
        i, beam_s, beam_p, visited, res_s, res_ids, done = state
        return (i < max_iters) & (~jnp.all(done))

    def body(state):
        i, beam_s, beam_p, visited, res_s, res_ids, done = state
        expanded = (beam_p & 1) == 1
        beam_ids = beam_p >> 1
        # pick the W best unexpanded beam entries per query (DiskANN-style
        # beamwidth: amortizes the per-step gather/top-k dispatch across W
        # expansions; the walk is slightly less greedy but each while_loop
        # step does W times the MXU work)
        cand_s = jnp.where(expanded, NEG_INF, beam_s)
        if W == 1:
            sel_pos = jnp.argmax(cand_s, axis=1)[:, None]  # (nq, 1)
            sel_score = jnp.take_along_axis(cand_s, sel_pos, axis=1)
        else:
            sel_score, sel_pos = jax.lax.top_k(cand_s, W)  # (nq, W)
        # hnswlib-equivalent termination: the walk ends when the ef-sized beam
        # holds no unexpanded candidate (draining the beam == candidate heap
        # empty relative to the ef result set)
        newly_done = sel_score[:, 0] == NEG_INF
        done = done | newly_done
        sel_valid = (sel_score != NEG_INF) & ~done[:, None]  # (nq, W)
        sel_id = jnp.take_along_axis(beam_ids, sel_pos, axis=1)  # (nq, W)
        # positional-compare instead of scatter: a (nq, ef) row scatter is
        # random access (~100M elems/s); the (nq, ef, W) equality fuses into
        # one VPU reduce
        cols_ef = jnp.arange(ef, dtype=sel_pos.dtype)
        beam_p = jnp.where(
            jnp.any(cols_ef[None, :, None] == sel_pos[:, None, :], axis=2),
            beam_p | 1,
            beam_p,
        )

        nbrs = jnp.take(graph, jnp.clip(sel_id.reshape(-1), 0), axis=0)  # (nq*W, deg)
        nbrs = nbrs.reshape(nq, W * deg)
        nbrs = jnp.where(
            jnp.repeat(sel_valid & (sel_id >= 0), deg, axis=1), nbrs, -1
        )
        # visited filter: ring membership + EXACT membership vs the current
        # beam. The in-beam check is load-bearing whenever the ring has
        # wrapped (long walks): a node evicted from the window re-enters as
        # "fresh", and without the beam check duplicate copies of the best
        # nodes crowd the beam until the final dedup returns fewer than k
        # unique ids (measured recall 1.0@ef=64 -> 0.51@ef=192 on a small
        # corpus). The earlier lossy hash had the same inversion from
        # collisions; the ring is exact whenever the walk fits RING_CAP.
        seen = jnp.any(nbrs[:, :, None] == visited[:, None, :], axis=2)
        in_beam = jnp.any(nbrs[:, :, None] == beam_ids[:, None, :], axis=2)
        fresh = (nbrs >= 0) & ~seen & ~in_beam
        if W > 1:
            # intra-step dedup: with W simultaneous expansions the same node
            # can arrive from several parents in ONE step — all lanes pass the
            # (stale) table/beam checks and the duplicate crowds a unique id
            # out of the k-wide result set. Keep only the first occurrence.
            # Exact triangular pairwise compare — measured 1.7x faster than
            # the sort-based formulation (XLA sort is many bitonic passes;
            # the (G, G) compare fuses into one reduce).
            G_cur = nbrs.shape[1]
            tri = jnp.tril(jnp.ones((G_cur, G_cur), bool), -1)  # j < i
            eq = nbrs[:, :, None] == nbrs[:, None, :]
            dup = jnp.any(eq & (fresh[:, None, :] & tri[None]), axis=2)
            fresh &= ~dup
        if W > 1 and compact_ratio < 1.0:
            # gather compaction: the walk is row-gather-bound (~90 Mrows/s on
            # v5e regardless of row width), and with W parallel expansions a
            # large fraction of lanes are stale (visited/duplicate). Stable-
            # sort fresh lanes first — lane order == parent beam rank, so the
            # truncated tail holds the worst parents' neighbors — and score
            # only the first G columns. Lanes compact BEFORE the visited-table
            # scatter so a truncated fresh lane stays unvisited and can
            # re-enter via a later parent.
            order = jnp.argsort(
                jnp.where(fresh, 0, 1).astype(jnp.int32), axis=1, stable=True
            )[:, :Gc]
            nbrs = jnp.take_along_axis(nbrs, order, axis=1)
            fresh = jnp.take_along_axis(fresh, order, axis=1)
        # append this step's fresh ids to the ring (stale lanes write -1,
        # which can never match a real id). Offsets cycle every n_slots steps
        # (recent-window semantics once the ring is full).
        ring_off = jnp.int32(E_eff) + (i % jnp.int32(n_slots)) * jnp.int32(Gc)
        visited = jax.lax.dynamic_update_slice(
            visited, jnp.where(fresh, nbrs, -1), (jnp.int32(0), ring_off)
        )

        nb_scores = score_nodes(jnp.where(fresh, nbrs, 0))
        nb_scores = jnp.where(fresh, nb_scores, NEG_INF)

        # result update (only bitset-valid nodes surface). Unmasked searches
        # skip it entirely: top-k is always a prefix of the score-sorted
        # ef-beam (beam evicts worst-first), so the final beam prefix IS the
        # result set — measured +25% QPS at identical recall.
        if has_mask:
            res_valid = fresh & jnp.take(keep_mask, jnp.clip(nbrs, 0), axis=0)
            res_cand_s = jnp.where(res_valid, nb_scores, NEG_INF)
            cat_rs = jnp.concatenate([res_s, res_cand_s], axis=1)
            cat_ri = jnp.concatenate([res_ids, jnp.where(res_valid, nbrs, -1)], axis=1)
            rs_, ri_ = jax.lax.sort((-cat_rs, cat_ri), dimension=1, num_keys=1)
            res_s, res_ids = -rs_[:, :k], ri_[:, :k]

        # beam update (all fresh nodes traverse, filtered or not) — ONE
        # variadic sort over (score, packed id|expanded); see the packing note
        # at beam init (replaces top_k + 2 take_along_axis)
        cat_s = jnp.concatenate([beam_s, nb_scores], axis=1)
        cat_p = jnp.concatenate([beam_p, jnp.where(fresh, nbrs << 1, -1)], axis=1)
        ns_, np_ = jax.lax.sort((-cat_s, cat_p), dimension=1, num_keys=1)
        beam_s, beam_p = -ns_[:, :ef], np_[:, :ef]
        return (i + 1, beam_s, beam_p, visited, res_s, res_ids, done)

    state = (
        jnp.int32(0),
        beam_s,
        beam_p,
        visited,
        res_s,
        res_ids,
        jnp.zeros((nq,), bool),
    )
    _, beam_s_f, beam_p_f, _, res_s, res_ids, _ = jax.lax.while_loop(
        cond, body, state
    )
    beam_ids_f = beam_p_f >> 1
    if not has_mask:
        # unmasked: the sorted ef-beam's k-prefix is the exact result set
        ke = min(k, ef)
        res_s = beam_s_f[:, :ke]
        res_ids = jnp.where(res_s == NEG_INF, -1, beam_ids_f[:, :ke])
        if ke < k:
            res_s = jnp.pad(res_s, ((0, 0), (0, k - ke)), constant_values=NEG_INF)
            res_ids = jnp.pad(res_ids, ((0, 0), (0, k - ke)), constant_values=-1)

    # lossy-hash collisions can duplicate ids in results: dedupe, keep best
    order = jnp.argsort(jnp.where(res_ids < 0, np.iinfo(np.int32).max, res_ids), axis=1)
    sid = jnp.take_along_axis(res_ids, order, axis=1)
    ss = jnp.take_along_axis(res_s, order, axis=1)
    dup = jnp.concatenate([jnp.zeros((nq, 1), bool), sid[:, 1:] == sid[:, :-1]], axis=1)
    ss = jnp.where(dup | (sid < 0), NEG_INF, ss)
    res_s, sel2 = jax.lax.top_k(ss, k)
    res_ids = jnp.take_along_axis(sid, sel2, axis=1)
    res_ids = jnp.where(res_s == NEG_INF, -1, res_ids)
    return res_s, res_ids
