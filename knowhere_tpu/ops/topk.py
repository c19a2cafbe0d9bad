"""Streaming tiled k-NN — distance matmul fused with running top-k merge.

This is the single most reused kernel of the framework (SURVEY.md §7 "hard
parts"): it replaces the reference's per-query SIMD scan + heap
(reference: thirdparty/faiss/.../utils/distances.cpp knn_L2sqr /
knn_inner_product / knn_cosine driven from src/common/comp/brute_force.cc:
207-298, with the per-query thread-pool fan-out at brute_force.cc:105-140).

TPU design: queries are processed as a batch (the query axis replaces the
reference's thread fan-out); the base is scanned in tiles of `tile` rows with
`lax.scan`, each step computing an (nq, tile) distance block on the MXU and
merging it into the running (nq, k) best via top_k — so the full (nq, nb)
distance matrix is never materialized in HBM. Filtered-out rows (BitsetView
keep-mask) are suppressed by writing -inf into the pre-merge scores.

All scores are internally sign-normalized to "larger is better"; the public
wrappers return distances in the metric's native convention.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import distances as D

# plain python float: creating a jnp scalar here would initialize the JAX
# backend as an import side effect, which a library must never do
_NEG_INF = -float("inf")

# Default base tile. Large tiles amortize the per-tile top-k/merge dispatch;
# the (nq_chunk, tile) f32 score block is transient HBM (2GB at 4096 x 131072).
DEFAULT_TILE = 131072
DEFAULT_QUERY_CHUNK = 4096

# Group width for the exact group-max top-k selection (see _knn_core). 64
# keeps the candidate merge at k*64 columns while the group-max top_k runs on
# tile/64 columns — both far cheaper than a full-tile top_k.
GROUP = 64


def _merge_topk(best_s, best_i, new_s, new_i, k: int):
    cat_s = jnp.concatenate([best_s, new_s], axis=1)
    cat_i = jnp.concatenate([best_i, new_i], axis=1)
    top_s, sel = jax.lax.top_k(cat_s, k)
    top_i = jnp.take_along_axis(cat_i, sel, axis=1)
    return top_s, top_i


def _tile_scores(metric_name: str, sign: float, q, b_tile, aux_tile, mask_tile):
    dist = D.pairwise_distance(metric_name, q, b_tile, aux_tile)
    score = dist * sign
    if mask_tile is not None:
        score = jnp.where(mask_tile[None, :], score, _NEG_INF)
    return score


@partial(
    jax.jit,
    static_argnames=("metric_name", "k", "tile", "has_aux", "has_mask"),
)
def _knn_core(
    q: jax.Array,
    base: jax.Array,
    aux: Optional[jax.Array],
    mask: Optional[jax.Array],
    *,
    metric_name: str,
    k: int,
    tile: int,
    has_aux: bool,
    has_mask: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scores (nq,k) sign-normalized desc, ids (nq,k) int32, -1 pad)."""
    if not has_aux:
        aux = None
    if not has_mask:
        mask = None
    nq = q.shape[0]
    nb = base.shape[0]
    sign = 1.0 if D.larger_is_better(metric_name) else -1.0

    n_full = nb // tile
    rem = nb - n_full * tile

    best_s = jnp.full((nq, k), _NEG_INF, dtype=jnp.float32)
    best_i = jnp.full((nq, k), -1, dtype=jnp.int32)

    if n_full > 0:
        body_base = base[: n_full * tile].reshape(n_full, tile, base.shape[1])
        body_aux = aux[: n_full * tile].reshape(n_full, tile) if aux is not None else None
        body_mask = mask[: n_full * tile].reshape(n_full, tile) if mask is not None else None
        offsets = (jnp.arange(n_full, dtype=jnp.int32) * tile).reshape(n_full, 1)

        kk = min(k, tile)
        # Exact group-max selection: full-tile lax.top_k is the FLAT
        # bottleneck (measured 1.6% of MXU roofline at 1M x 128). Instead,
        # reduce the tile's scores to per-GROUP maxima, top_k over tile/GROUP
        # group maxima, and gather only the winning groups' scores into the
        # merge. Exact: every global top-k element lives in a group whose max
        # is >= the global k-th best score, and at most k groups can hold such
        # maxima — so the top-k groups by max cover all global top-k elements
        # in this tile. (Ties at the k-th value may resolve differently than
        # a full sort — same latitude the reference's heap has.)
        n_groups = tile // GROUP
        use_groups = tile % GROUP == 0 and kk <= n_groups and n_groups >= 2

        def step(carry, inp):
            bs, bi = carry
            b_tile, aux_tile, mask_tile, off = inp
            score = _tile_scores(metric_name, sign, q, b_tile, aux_tile, mask_tile)
            if use_groups:
                sg = score.reshape(nq, n_groups, GROUP)
                gmax = jnp.max(sg, axis=2)
                _, g_i = jax.lax.top_k(gmax, kk)  # (nq, kk) winning groups
                cand = jnp.take_along_axis(sg, g_i[:, :, None], axis=1)
                cand_ids = (
                    g_i[:, :, None] * GROUP
                    + jnp.arange(GROUP, dtype=jnp.int32)[None, None, :]
                )
                s_t = cand.reshape(nq, kk * GROUP)
                i_t = cand_ids.reshape(nq, kk * GROUP) + off[0]
            else:
                s_t, i_t = jax.lax.top_k(score, kk)
                i_t = i_t.astype(jnp.int32) + off[0]
            bs, bi = _merge_topk(bs, bi, s_t, i_t, k)
            return (bs, bi), None

        xs = (body_base, body_aux, body_mask, offsets)
        (best_s, best_i), _ = jax.lax.scan(step, (best_s, best_i), xs)

    if rem > 0:
        b_tile = base[n_full * tile :]
        aux_tile = aux[n_full * tile :] if aux is not None else None
        mask_tile = mask[n_full * tile :] if mask is not None else None
        score = _tile_scores(metric_name, sign, q, b_tile, aux_tile, mask_tile)
        kk = min(k, rem)
        rem_pad = (-rem) % GROUP
        rem_groups = (rem + rem_pad) // GROUP
        if kk <= rem_groups and rem_groups >= 2:
            # same group-max selection as the main scan (pad to a GROUP
            # multiple with -inf so padded lanes never win; padded lanes
            # carry ids >= nb but their -inf score maps them to -1 below)
            score_p = (
                jnp.pad(score, ((0, 0), (0, rem_pad)), constant_values=_NEG_INF)
                if rem_pad
                else score
            )
            sg = score_p.reshape(nq, rem_groups, GROUP)
            gmax = jnp.max(sg, axis=2)
            _, g_i = jax.lax.top_k(gmax, kk)
            cand = jnp.take_along_axis(sg, g_i[:, :, None], axis=1)
            cand_ids = (
                g_i[:, :, None] * GROUP
                + jnp.arange(GROUP, dtype=jnp.int32)[None, None, :]
            )
            s_t = cand.reshape(nq, kk * GROUP)
            i_t = cand_ids.reshape(nq, kk * GROUP) + n_full * tile
            best_s, best_i = _merge_topk(best_s, best_i, s_t, i_t, k)
        else:
            s_t, i_t = jax.lax.top_k(score, kk)
            idx_t = i_t.astype(jnp.int32) + n_full * tile
            best_s, best_i = _merge_topk(best_s, best_i, s_t, idx_t, k)

    # -1 ids for slots that never got a real candidate
    best_i = jnp.where(best_s == _NEG_INF, -1, best_i)
    return best_s, best_i


def knn_device(
    q: jax.Array,
    base: jax.Array,
    k: int,
    metric_name: str,
    aux: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    tile: int = DEFAULT_TILE,
) -> Tuple[jax.Array, jax.Array]:
    """Device-level kNN: returns (dists (nq,k) native convention, ids int32).

    Stays on device — building block for index-internal passes (refine, IVF).
    """
    metric_name = metric_name.upper()
    nb = base.shape[0]
    tile = min(tile, max(nb, 1))
    scores, ids = _knn_core(
        q,
        base,
        aux,
        mask,
        metric_name=metric_name,
        k=k,
        tile=tile,
        has_aux=aux is not None,
        has_mask=mask is not None,
    )
    sign = 1.0 if D.larger_is_better(metric_name) else -1.0
    return scores * sign, ids


def knn_search(
    queries: np.ndarray,
    base,
    k: int,
    metric_name: str,
    bitset_mask: Optional[jax.Array] = None,
    aux: Optional[jax.Array] = None,
    tile: int = DEFAULT_TILE,
    query_chunk: int = DEFAULT_QUERY_CHUNK,
    id_map: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-level brute-force kNN over a device-resident base.

    Chunks the query axis to bound HBM pressure, runs `_knn_core` per chunk,
    and returns numpy (ids (nq,k) int64 with -1 padding, dists (nq,k) f32) per
    the result contract (reference dataset.h:405-434).

    `id_map`: optional int64 external-id table (ids are remapped on the host).
    """
    metric_name = metric_name.upper()
    q_all = np.asarray(queries)
    nq = q_all.shape[0]
    out_ids = np.empty((nq, k), dtype=np.int64)
    out_dist = np.empty((nq, k), dtype=np.float32)

    from .. import comp as _comp

    for s in range(0, nq, query_chunk):
        _comp.check_current_cancellation()  # per-chunk (ivf.cc:962 analog)
        e = min(s + query_chunk, nq)
        q_dev = jax.device_put(q_all[s:e])
        dists, ids = knn_device(
            q_dev, base, k, metric_name, aux=aux, mask=bitset_mask, tile=tile
        )
        ids_np = np.asarray(ids, dtype=np.int64)
        out_dist[s:e] = np.asarray(dists)
        if id_map is not None:
            valid = ids_np >= 0
            remapped = np.where(valid, id_map[np.clip(ids_np, 0, None)], -1)
            out_ids[s:e] = remapped
        else:
            out_ids[s:e] = ids_np
    return out_ids, out_dist
