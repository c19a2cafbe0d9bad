"""Shared test fixtures: dataset generators and recall oracles.

Parity with the reference test helpers (tests/ut/utils.h:42-291 GenDataSet /
GetKNNRecall / GetRangeSearchRecall) and its recall floors
(tests/ut/test_search.cc:13-14: ANN >= 0.6, BruteForce >= 0.95).
"""

from __future__ import annotations

import numpy as np

import knowhere_tpu as kt

KNN_RECALL_THRESHOLD = 0.6
BRUTE_FORCE_RECALL_THRESHOLD = 0.95


def gen_dataset(rows: int, dim: int, seed: int = 42) -> kt.DataSet:
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((rows, dim), dtype=np.float32)
    return kt.GenDataSetFromArray(x)


def gen_binary_dataset(rows: int, dim_bits: int, seed: int = 42) -> kt.DataSet:
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, size=(rows, dim_bits // 8), dtype=np.uint8)
    ds = kt.GenDataSet(rows, dim_bits, x)
    return ds


def gen_sparse_dataset(rows: int, dim: int, nnz_per_row: int = 8, seed: int = 42):
    rng = np.random.default_rng(seed)
    data = []
    for _ in range(rows):
        idx = rng.choice(dim, size=min(nnz_per_row, dim), replace=False)
        vals = rng.random(len(idx)).astype(np.float32) + 0.05
        data.append({int(i): float(v) for i, v in zip(idx, vals)})
    return kt.GenSparseDataSet(data, dim)


def gen_bitset(n: int, filter_ratio: float, seed: int = 7) -> kt.BitsetView:
    rng = np.random.default_rng(seed)
    filtered = rng.random(n) < filter_ratio
    return kt.BitsetView.from_bool_array(filtered)


def knn_recall(gt_ids: np.ndarray, result_ids: np.ndarray, nq: int, k: int) -> float:
    """|result ∩ ground truth| / (nq*k) (reference GetKNNRecall)."""
    gt = np.asarray(gt_ids).reshape(nq, -1)[:, :k]
    res = np.asarray(result_ids).reshape(nq, -1)[:, :k]
    hits = 0
    for i in range(nq):
        hits += len(set(gt[i].tolist()) & set(res[i].tolist()) - {-1})
    return hits / float(nq * k)


def range_search_recall(gt, res, nq) -> float:
    """Overlap of CSR result sets (reference GetRangeSearchRecall)."""
    gt_ids, gt_lims = gt.ids, gt.lims
    r_ids, r_lims = res.ids, res.lims
    total_gt = gt_lims[-1]
    if total_gt == 0:
        return 1.0 if r_lims[-1] == 0 else 0.0
    hits = 0
    for i in range(nq):
        s_gt = set(gt_ids[gt_lims[i] : gt_lims[i + 1]].tolist())
        s_r = set(r_ids[r_lims[i] : r_lims[i + 1]].tolist())
        hits += len(s_gt & s_r)
    return hits / float(total_gt)


def brute_force_gt(base_ds, query_ds, metric: str, k: int, bitset=None):
    """Ground truth via numpy (independent oracle, not our device kernels)."""
    xb = np.asarray(base_ds.tensor, dtype=np.float64)
    xq = np.asarray(query_ds.tensor, dtype=np.float64)
    if metric == "L2":
        d = ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
        larger = False
    elif metric == "IP":
        d = xq @ xb.T
        larger = True
    elif metric == "COSINE":
        qn = np.linalg.norm(xq, axis=1, keepdims=True)
        bn = np.linalg.norm(xb, axis=1, keepdims=True)
        qn[qn == 0] = 1
        bn[bn == 0] = 1
        d = (xq / qn) @ (xb / bn).T
        larger = True
    else:
        raise ValueError(metric)
    if bitset is not None and not bitset.empty_view():
        keep = bitset.host_mask(xb.shape[0])
        d = np.where(keep[None, :], d, -np.inf if larger else np.inf)
    order = np.argsort(-d if larger else d, axis=1, kind="stable")[:, :k]
    dists = np.take_along_axis(d, order, axis=1)
    return order.astype(np.int64), dists.astype(np.float32)
