"""Sparse vector search: brute force now; inverted index families below.

Reference behavior being reproduced:
- SparseRow storage + BM25 doc-value computer
  (include/knowhere/sparse_utils.h:62-201)
- Sparse brute force incl. BM25 (src/common/comp/brute_force.cc SearchSparse,
  brute_force.h:50-57)
- SPARSE_INVERTED_INDEX / SPARSE_WAND families
  (src/index/sparse/sparse_index_node.cc, inverted_index.h) — implemented in a
  TPU-friendly SINDI/TAAT-batched formulation (SURVEY.md §7.7): postings live
  as padded dense blocks scored with batched accumulates, instead of the
  pointer-chasing DAAT WAND loops.

Sparse rows on the Python surface are dicts {dim_index: value} (or
(indices, values) pairs); internally CSR numpy.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..bitset import BitsetView
from ..config import BaseConfig, Config, Stage
from ..dataset import DataSet, GenRangeResultDataSet, GenResultDataSet
from ..index_node import PrecomputedDistanceIterator
from ..index_param import metric as M
from ..index_param import normalize_metric
from ..status import KnowhereException, Status, expected


# ---------------------------------------------------------------------------
# CSR helpers
# ---------------------------------------------------------------------------


def rows_to_csr(rows: List[Dict[int, float]]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """list of {dim: val} -> (indptr, indices, values)."""
    indptr = np.zeros(len(rows) + 1, dtype=np.int64)
    idx_list, val_list = [], []
    for i, row in enumerate(rows):
        if isinstance(row, dict):
            items = sorted(row.items())
            idx = np.fromiter((k for k, _ in items), dtype=np.int32, count=len(items))
            val = np.fromiter((v for _, v in items), dtype=np.float32, count=len(items))
        else:  # (indices, values) pair
            idx = np.asarray(row[0], dtype=np.int32)
            val = np.asarray(row[1], dtype=np.float32)
        idx_list.append(idx)
        val_list.append(val)
        indptr[i + 1] = indptr[i] + len(idx)
    indices = np.concatenate(idx_list) if idx_list else np.empty(0, np.int32)
    values = np.concatenate(val_list) if val_list else np.empty(0, np.float32)
    return indptr, indices, values


def bm25_doc_values(
    values: np.ndarray, row_sums: np.ndarray, indptr: np.ndarray, k1: float, b: float, avgdl: float
) -> np.ndarray:
    """Per-element BM25 doc value: tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    (reference sparse_utils.h BM25 doc-value computer). `row_sums` is the
    document length (sum of term frequencies)."""
    avgdl = max(avgdl, 1e-9)
    dl = np.repeat(row_sums, np.diff(indptr))
    return values * (k1 + 1.0) / (values + k1 * (1.0 - b + b * dl / avgdl))


def _score_matrix(
    base_csr: Tuple[np.ndarray, np.ndarray, np.ndarray],
    q_rows: List[Dict[int, float]],
    nb: int,
    metric_name: str,
    bm25_params: Optional[Tuple[float, float, float]],
    drop_ratio_search: float = 0.0,
) -> np.ndarray:
    """(nq, nb) sparse dot-product / BM25 scores, computed query-at-a-time via
    per-dimension postings (host numpy; device kernels arrive with the
    inverted-index implementation)."""
    indptr, indices, values = base_csr
    if metric_name == M.BM25:
        k1, b, avgdl = bm25_params
        row_sums = np.add.reduceat(values, indptr[:-1]) if len(values) else np.zeros(nb)
        row_sums = np.where(np.diff(indptr) == 0, 0.0, row_sums)
        vals_eff = bm25_doc_values(values, row_sums, indptr, k1, b, avgdl)
    else:
        vals_eff = values
    # postings: dim -> (doc ids, doc values)
    order = np.argsort(indices, kind="stable")
    sorted_dims = indices[order]
    doc_of = np.repeat(np.arange(nb, dtype=np.int64), np.diff(indptr))[order]
    val_of = vals_eff[order]
    uniq_dims, starts = np.unique(sorted_dims, return_index=True)
    ends = np.append(starts[1:], len(sorted_dims))
    dim_slot = {int(d): (int(s), int(e)) for d, s, e in zip(uniq_dims, starts, ends)}

    nq = len(q_rows)
    scores = np.zeros((nq, nb), dtype=np.float32)
    for qi, qrow in enumerate(q_rows):
        items = list(qrow.items()) if isinstance(qrow, dict) else list(zip(*qrow))
        if drop_ratio_search > 0 and items:
            vals_abs = np.abs(np.asarray([v for _, v in items], dtype=np.float32))
            thresh = np.quantile(vals_abs, drop_ratio_search) if len(vals_abs) else 0.0
            items = [(d, v) for (d, v) in items if abs(v) >= thresh]
        for d, v in items:
            slot = dim_slot.get(int(d))
            if slot is None:
                continue
            s, e = slot
            scores[qi, doc_of[s:e]] += v * val_of[s:e]
    return scores


def _load_sparse_cfg(json_cfg: dict, stage: Stage):
    cfg = BaseConfig()
    st, msg = Config.load(cfg, json_cfg or {}, stage)
    if st != Status.success:
        return None, st, msg
    m = normalize_metric(cfg.metric_type)
    if m not in (M.IP, M.BM25):
        return None, Status.invalid_metric_type, f"sparse search supports IP/BM25, got {m}"
    if m == M.BM25 and (cfg.bm25_k1 is None or cfg.bm25_b is None or cfg.bm25_avgdl is None):
        return None, Status.invalid_param_in_json, "BM25 requires bm25_k1/bm25_b/bm25_avgdl"
    return cfg, Status.success, ""


def _sparse_scores_for(base_dataset: DataSet, query_dataset: DataSet, cfg, m: str) -> np.ndarray:
    base_rows = base_dataset.tensor
    q_rows = query_dataset.tensor
    csr = rows_to_csr(base_rows)
    bm25 = (cfg.bm25_k1, cfg.bm25_b, cfg.bm25_avgdl) if m == M.BM25 else None
    return _score_matrix(csr, q_rows, len(base_rows), m, bm25)


def brute_force_search_sparse(
    base_dataset: DataSet, query_dataset: DataSet, json_cfg: dict, bitset: Optional[BitsetView]
) -> "expected[DataSet]":
    cfg, st, msg = _load_sparse_cfg(json_cfg, Stage.SEARCH)
    if st != Status.success:
        return expected.Err(st, msg)
    m = normalize_metric(cfg.metric_type)
    scores = _sparse_scores_for(base_dataset, query_dataset, cfg, m)
    nb = len(base_dataset.tensor)
    if bitset is not None and not bitset.empty_view():
        keep = bitset.host_mask(nb)
        scores = np.where(keep[None, :], scores, -np.inf)
    k = cfg.k
    nq = scores.shape[0]
    kk = min(k, nb)
    part = np.argpartition(-scores, kth=kk - 1, axis=1)[:, :kk]
    ids = np.full((nq, k), -1, dtype=np.int64)
    dists = np.zeros((nq, k), dtype=np.float32)
    for i in range(nq):
        sel = part[i][np.argsort(-scores[i, part[i]], kind="stable")]
        vals = scores[i, sel]
        valid = vals > 0  # sparse results: zero/neg-inf overlap == no match
        cnt = int(valid.sum())
        ids[i, :cnt] = sel[valid]
        dists[i, :cnt] = vals[valid]
    return expected.Ok(GenResultDataSet(nq, k, ids, dists))


def brute_force_range_search_sparse(
    base_dataset: DataSet, query_dataset: DataSet, json_cfg: dict, bitset: Optional[BitsetView]
) -> "expected[DataSet]":
    cfg, st, msg = _load_sparse_cfg(json_cfg, Stage.RANGE_SEARCH)
    if st != Status.success:
        return expected.Err(st, msg)
    m = normalize_metric(cfg.metric_type)
    scores = _sparse_scores_for(base_dataset, query_dataset, cfg, m)
    nb = len(base_dataset.tensor)
    if bitset is not None and not bitset.empty_view():
        keep = bitset.host_mask(nb)
        scores = np.where(keep[None, :], scores, -np.inf)
    radius = cfg.radius
    range_filter = cfg.range_filter
    two_sided = np.isfinite(range_filter)
    nq = scores.shape[0]
    all_ids, all_dists = [], []
    lims = np.zeros(nq + 1, dtype=np.int64)
    for i in range(nq):
        keep_i = scores[i] > radius
        if two_sided:
            keep_i &= scores[i] <= range_filter
        sel = np.nonzero(keep_i)[0]
        vals = scores[i, sel]
        order = np.argsort(-vals, kind="stable")
        all_ids.append(sel[order].astype(np.int64))
        all_dists.append(vals[order].astype(np.float32))
        lims[i + 1] = lims[i] + len(sel)
    ids = np.concatenate(all_ids) if all_ids else np.empty(0, np.int64)
    dists = np.concatenate(all_dists) if all_dists else np.empty(0, np.float32)
    return expected.Ok(GenRangeResultDataSet(nq, ids, dists, lims))


def brute_force_ann_iterator_sparse(
    base_dataset: DataSet, query_dataset: DataSet, json_cfg: dict, bitset: Optional[BitsetView]
) -> "expected[list]":
    cfg, st, msg = _load_sparse_cfg(json_cfg, Stage.ITERATOR)
    if st != Status.success:
        return expected.Err(st, msg)
    m = normalize_metric(cfg.metric_type)
    scores = _sparse_scores_for(base_dataset, query_dataset, cfg, m)
    nb = len(base_dataset.tensor)
    keep = bitset.host_mask(nb) if bitset is not None and not bitset.empty_view() else None
    its = [PrecomputedDistanceIterator(scores[i], keep, larger_is_closer=True) for i in range(scores.shape[0])]
    return expected.Ok(its)
