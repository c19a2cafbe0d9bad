"""Range search — all neighbors within a radius, CSR output.

Parity with the reference predicate (include/knowhere/range_util.h:22-25):
- distance metrics (L2/HAMMING/...):  keep if  range_filter <= dist < radius
- similarity metrics (IP/COSINE):     keep if  radius < dist <= range_filter
with range_filter == +inf sentinel meaning "radius bound only"
(config.h:583,596-597; two-sided only when the caller sets range_filter).

TPU design: distances are computed tile-by-tile on device (same MXU path as
kNN), the keep-predicate is evaluated on device, and only the surviving
(id, dist) pairs are compacted — per (query-chunk, base-tile) block — on the
host into CSR (ids, dists, lims). The reference instead runs a per-query
scan+filter on the thread pool (brute_force.cc:327-400).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import distances as D
from ..config import DEFAULT_RANGE_FILTER


@partial(jax.jit, static_argnames=("metric_name", "has_aux", "has_mask", "two_sided"))
def _range_tile(
    q, b_tile, aux_tile, mask_tile, radius, range_filter,
    *, metric_name: str, has_aux: bool, has_mask: bool, two_sided: bool,
):
    if not has_aux:
        aux_tile = None
    dist = D.pairwise_distance(metric_name, q, b_tile, aux_tile)
    if D.larger_is_better(metric_name):
        keep = dist > radius
        if two_sided:
            keep &= dist <= range_filter
    else:
        keep = dist < radius
        if two_sided:
            keep &= dist >= range_filter
    if has_mask:
        keep &= mask_tile[None, :]
    return dist, keep


def range_search(
    queries: np.ndarray,
    base,
    radius: float,
    range_filter: float,
    metric_name: str,
    bitset_mask=None,
    aux=None,
    tile: int = 65536,
    query_chunk: int = 1024,
    id_map: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (ids int64, dists f32, lims int64[nq+1]) in CSR form."""
    metric_name = metric_name.upper()
    q_all = np.asarray(queries)
    nq = q_all.shape[0]
    nb = base.shape[0]
    two_sided = not (range_filter == DEFAULT_RANGE_FILTER or np.isinf(range_filter))

    per_query_ids = [[] for _ in range(nq)]
    per_query_dists = [[] for _ in range(nq)]

    for qs in range(0, nq, query_chunk):
        qe = min(qs + query_chunk, nq)
        q_dev = jax.device_put(q_all[qs:qe])
        for bs in range(0, nb, tile):
            be = min(bs + tile, nb)
            b_tile = base[bs:be]
            aux_tile = aux[bs:be] if aux is not None else None
            mask_tile = bitset_mask[bs:be] if bitset_mask is not None else None
            dist, keep = _range_tile(
                q_dev, b_tile, aux_tile,
                mask_tile if mask_tile is not None else jnp.zeros((be - bs,), bool),
                jnp.float32(radius), jnp.float32(range_filter),
                metric_name=metric_name, has_aux=aux is not None,
                has_mask=bitset_mask is not None, two_sided=two_sided,
            )
            keep_np = np.asarray(keep)
            if not keep_np.any():
                continue
            dist_np = np.asarray(dist)
            rows, cols = np.nonzero(keep_np)
            gids = cols + bs
            if id_map is not None:
                gids = id_map[gids]
            for r in np.unique(rows):
                sel = rows == r
                per_query_ids[qs + r].append(gids[sel])
                per_query_dists[qs + r].append(dist_np[rows[sel], cols[sel]])

    lims = np.zeros(nq + 1, dtype=np.int64)
    all_ids, all_dists = [], []
    larger = D.larger_is_better(metric_name)
    for i in range(nq):
        if per_query_ids[i]:
            ids_i = np.concatenate(per_query_ids[i])
            d_i = np.concatenate(per_query_dists[i])
            # results sorted best-first within each query (reference
            # GetRangeSearchResult sorts per-nq)
            order = np.argsort(-d_i if larger else d_i, kind="stable")
            ids_i, d_i = ids_i[order], d_i[order]
        else:
            ids_i = np.empty(0, dtype=np.int64)
            d_i = np.empty(0, dtype=np.float32)
        all_ids.append(ids_i)
        all_dists.append(d_i)
        lims[i + 1] = lims[i] + len(ids_i)

    ids = np.concatenate(all_ids) if all_ids else np.empty(0, dtype=np.int64)
    dists = np.concatenate(all_dists) if all_dists else np.empty(0, dtype=np.float32)
    return ids.astype(np.int64), dists.astype(np.float32), lims


def apply_range_search_k(
    ids: np.ndarray,
    dists: np.ndarray,
    lims: np.ndarray,
    range_search_k: int,
    larger_is_closer: bool,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cap each query's range hits to its BEST `range_search_k` (reference
    BaseConfig range_search_k, default -1 = unlimited). `range_search`
    returns each query's hits sorted best-first, so the cap is a slice."""
    del larger_is_closer  # hits arrive best-first; kept for signature clarity
    if range_search_k is None or range_search_k < 0:
        return ids, dists, lims
    nq = len(lims) - 1
    out_i, out_d = [], []
    new_lims = np.zeros(nq + 1, dtype=np.int64)
    for qi in range(nq):
        sl = slice(int(lims[qi]), min(int(lims[qi]) + range_search_k, int(lims[qi + 1])))
        out_i.append(ids[sl])
        out_d.append(dists[sl])
        new_lims[qi + 1] = new_lims[qi] + (sl.stop - sl.start)
    ids2 = np.concatenate(out_i) if out_i else np.empty(0, ids.dtype)
    d2 = np.concatenate(out_d) if out_d else np.empty(0, dists.dtype)
    return ids2, d2, new_lims
