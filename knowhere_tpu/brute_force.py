"""BruteForce — index-free exact search (the recall oracle).

Parity with the reference static API
(reference: include/knowhere/comp/brute_force.h:29-66,
src/common/comp/brute_force.cc:164-400): Search / SearchWithBuf / RangeSearch /
AnnIterator over dense float (L2/IP/COSINE) and binary
(HAMMING/JACCARD/SUB/SUPERSTRUCTURE) data. Sparse brute force
(SearchSparse, BM25) lives in models/sparse.py and is re-exported here.

TPU design: the reference fans out one thread-pool task per query
(brute_force.cc:105-140); here the query axis is a device batch dimension and
the base is streamed through the tiled MXU kNN kernel (ops/topk.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .bitset import BitsetView
from .config import BruteForceConfig, Config, Stage
from .dataset import DataSet, GenRangeResultDataSet, GenResultDataSet
from .index_param import BINARY_METRICS, DENSE_FLOAT_METRICS, normalize_metric
from .index_node import PrecomputedDistanceIterator
from .ops import distances as D
from .ops import topk as T
from .ops import range as R
from .status import KnowhereException, Status, expected, guarded_call, guarded_expected


def _prep(base_ds: DataSet, query_ds: DataSet, metric: str):
    """Returns (q_np, base_dev, aux_dev) ready for the tiled kernels."""
    xb = np.asarray(base_ds.tensor)
    xq = np.asarray(query_ds.tensor)
    if metric in BINARY_METRICS:
        dim_bits = base_ds.dim
        xb = D.unpack_bits_host(xb.view(np.uint8), dim_bits)
        xq = D.unpack_bits_host(xq.view(np.uint8), dim_bits)
    b_dev = jax.device_put(xb)
    aux = D.base_aux(metric, b_dev)
    return xq, b_dev, aux


def _check_metric(base_ds: DataSet, metric: str) -> Optional[str]:
    if base_ds.is_sparse:
        return None
    is_bin_data = np.asarray(base_ds.tensor).dtype == np.uint8
    if metric in BINARY_METRICS:
        return None if is_bin_data else f"binary metric {metric} requires packed uint8 data"
    if metric in DENSE_FLOAT_METRICS:
        return None if not is_bin_data else f"metric {metric} not valid for binary data"
    return f"metric {metric} not supported by BruteForce for this data type"


class BruteForce:
    @staticmethod
    def Search(
        base_dataset: DataSet,
        query_dataset: DataSet,
        json_cfg: Optional[dict] = None,
        bitset: Optional[BitsetView] = None,
    ) -> "expected[DataSet]":
        def impl():
            if base_dataset.is_sparse:
                from .models.sparse import brute_force_search_sparse

                return brute_force_search_sparse(
                    base_dataset, query_dataset, json_cfg or {}, bitset
                )
            cfg = BruteForceConfig()
            st, msg = Config.load(cfg, json_cfg or {}, Stage.SEARCH)
            if st != Status.success:
                return expected.Err(st, msg)
            metric = normalize_metric(cfg.metric_type)
            err = _check_metric(base_dataset, metric)
            if err:
                return expected.Err(Status.invalid_metric_type, err)
            nq, k = query_dataset.rows, cfg.k
            xq, b_dev, aux = _prep(base_dataset, query_dataset, metric)
            mask = bitset.device_mask(base_dataset.rows) if bitset and not bitset.empty_view() else None
            ids, dists = T.knn_search(xq, b_dev, k, metric, bitset_mask=mask, aux=aux)
            return expected.Ok(GenResultDataSet(nq, k, ids, dists))

        return guarded_expected(impl)

    @staticmethod
    def SearchWithBuf(
        base_dataset: DataSet,
        query_dataset: DataSet,
        ids_buf: np.ndarray,
        dist_buf: np.ndarray,
        json_cfg: Optional[dict] = None,
        bitset: Optional[BitsetView] = None,
    ) -> Status:
        res = BruteForce.Search(base_dataset, query_dataset, json_cfg, bitset)
        if not res.has_value():
            return res.error()
        ds = res.value()
        np.copyto(np.asarray(ids_buf).reshape(-1), ds.ids)
        np.copyto(np.asarray(dist_buf).reshape(-1), ds.distance)
        return Status.success

    @staticmethod
    def RangeSearch(
        base_dataset: DataSet,
        query_dataset: DataSet,
        json_cfg: Optional[dict] = None,
        bitset: Optional[BitsetView] = None,
    ) -> "expected[DataSet]":
        def impl():
            if base_dataset.is_sparse:
                from .models.sparse import brute_force_range_search_sparse

                return brute_force_range_search_sparse(
                    base_dataset, query_dataset, json_cfg or {}, bitset
                )
            cfg = BruteForceConfig()
            st, msg = Config.load(cfg, json_cfg or {}, Stage.RANGE_SEARCH)
            if st != Status.success:
                return expected.Err(st, msg)
            metric = normalize_metric(cfg.metric_type)
            err = _check_metric(base_dataset, metric)
            if err:
                return expected.Err(Status.invalid_metric_type, err)
            xq, b_dev, aux = _prep(base_dataset, query_dataset, metric)
            mask = bitset.device_mask(base_dataset.rows) if bitset and not bitset.empty_view() else None
            ids, dists, lims = R.range_search(
                xq, b_dev, cfg.radius, cfg.range_filter, metric,
                bitset_mask=mask, aux=aux,
            )
            ids, dists, lims = R.apply_range_search_k(
                ids, dists, lims, cfg.get("range_search_k", -1), D.larger_is_better(metric)
            )
            return expected.Ok(GenRangeResultDataSet(query_dataset.rows, ids, dists, lims))

        return guarded_expected(impl)

    @staticmethod
    def SearchSparse(
        base_dataset: DataSet,
        query_dataset: DataSet,
        json_cfg: Optional[dict] = None,
        bitset: Optional[BitsetView] = None,
    ) -> "expected[DataSet]":
        """Named sparse entrypoint (reference brute_force.h:50-57
        SearchSparse); Search() auto-detects sparse datasets and routes to
        the same implementation."""

        def impl():
            from .models.sparse import brute_force_search_sparse

            if not base_dataset.is_sparse:
                return expected.Err(
                    Status.invalid_args, "SearchSparse requires a sparse dataset"
                )
            return brute_force_search_sparse(
                base_dataset, query_dataset, json_cfg or {}, bitset
            )

        return guarded_expected(impl)

    @staticmethod
    def SearchSparseWithBuf(
        base_dataset: DataSet,
        query_dataset: DataSet,
        ids_buf: np.ndarray,
        dist_buf: np.ndarray,
        json_cfg: Optional[dict] = None,
        bitset: Optional[BitsetView] = None,
    ) -> Status:
        res = BruteForce.SearchSparse(base_dataset, query_dataset, json_cfg, bitset)
        if not res.has_value():
            return res.error()
        ds = res.value()
        np.copyto(np.asarray(ids_buf).reshape(-1), ds.ids)
        np.copyto(np.asarray(dist_buf).reshape(-1), ds.distance)
        return Status.success

    @staticmethod
    def SearchOnChunkWithBuf(
        chunk_datasets: list,
        query_dataset: DataSet,
        ids_buf: np.ndarray,
        dist_buf: np.ndarray,
        json_cfg: Optional[dict] = None,
        bitset: Optional[BitsetView] = None,
    ) -> Status:
        """Exact top-k over a MULTI-CHUNK base written into caller buffers
        (reference brute_force.h:38-42 SearchOnChunkWithBuf). Ids are global
        over the concatenated chunk row space; the bitset indexes that space."""

        def impl() -> Status:
            cfg = BruteForceConfig()
            st, msg = Config.load(cfg, json_cfg or {}, Stage.SEARCH)
            if st != Status.success:
                return st
            metric = normalize_metric(cfg.metric_type)
            k = int(cfg.k)
            total = sum(ds.rows for ds in chunk_datasets)
            keep = (
                bitset.host_mask(total)
                if bitset and not bitset.empty_view()
                else None
            )
            larger = D.larger_is_better(metric)
            nq = query_dataset.rows
            # per-chunk tiled top-k + host merge — never materializes the
            # (nq, total_rows) distance matrix (a 10M-row chunked base would
            # need gigabytes host-side; each chunk contributes only (nq, k))
            part_ids, part_d = [], []
            row0 = 0
            for ds in chunk_datasets:
                err = _check_metric(ds, metric)
                if err:
                    raise KnowhereException(err, Status.invalid_metric_type)
                xq, b_dev, aux = _prep(ds, query_dataset, metric)
                mask_c = (
                    jax.device_put(keep[row0 : row0 + ds.rows])
                    if keep is not None
                    else None
                )
                ids_c, d_c = T.knn_search(
                    xq, b_dev, min(k, ds.rows), metric, bitset_mask=mask_c, aux=aux
                )
                ids_c = np.asarray(ids_c, dtype=np.int64)
                part_ids.append(np.where(ids_c >= 0, ids_c + row0, -1))
                part_d.append(np.asarray(d_c, dtype=np.float32))
                row0 += ds.rows
            cat_i = np.concatenate(part_ids, axis=1)
            cat_d = np.concatenate(part_d, axis=1)
            bad = cat_i < 0
            key = np.where(bad, -np.inf if larger else np.inf, cat_d)
            order = np.argsort(-key if larger else key, axis=1, kind="stable")[:, :k]
            d_top = np.take_along_axis(key, order, axis=1)
            ids = np.take_along_axis(cat_i, order, axis=1)
            invalid = ~np.isfinite(d_top)
            ids = np.where(invalid, -1, ids)
            kk = min(k, cat_i.shape[1])
            out_i = np.full((nq, k), -1, np.int64)
            out_d = np.full((nq, k), np.inf if not larger else -np.inf, np.float32)
            out_i[:, :kk] = ids[:, :kk]
            out_d[:, :kk] = d_top[:, :kk]
            np.copyto(np.asarray(ids_buf).reshape(nq, k), out_i)
            np.copyto(np.asarray(dist_buf).reshape(nq, k), out_d)
            return Status.success

        return guarded_call(impl)

    @staticmethod
    def AnnIteratorOnChunk(
        chunk_datasets: list,
        query_dataset: DataSet,
        json_cfg: Optional[dict] = None,
        bitset: Optional[BitsetView] = None,
    ) -> "expected[list]":
        """Iterators over a MULTI-CHUNK base (reference brute_force.h
        AnnIteratorOnChunk + dataset.h:296-317 chunked datasets): each chunk
        is scanned independently and the per-query streams merge by distance.
        Ids are global (chunk offsets accumulate); the bitset indexes the
        concatenated row space."""

        def impl():
            from .index_node import PrecomputedDistanceIterator

            cfg = BruteForceConfig()
            st, msg = Config.load(cfg, json_cfg or {}, Stage.ITERATOR)
            if st != Status.success:
                return expected.Err(st, msg)
            metric = normalize_metric(cfg.metric_type)
            total = sum(ds.rows for ds in chunk_datasets)
            keep = (
                bitset.host_mask(total)
                if bitset and not bitset.empty_view()
                else None
            )
            larger = D.larger_is_better(metric)
            nq = query_dataset.rows
            dmats = []
            for ds in chunk_datasets:
                err = _check_metric(ds, metric)
                if err:
                    return expected.Err(Status.invalid_metric_type, err)
                xq, b_dev, aux = _prep(ds, query_dataset, metric)
                dmats.append(np.asarray(D.pairwise_distance(metric, jax.device_put(xq), b_dev, aux)))
            dmat = np.concatenate(dmats, axis=1)  # (nq, total)
            iterators = [
                PrecomputedDistanceIterator(dmat[r], keep, larger) for r in range(nq)
            ]
            return expected.Ok(iterators)

        return guarded_expected(impl)

    @staticmethod
    def AnnIterator(
        base_dataset: DataSet,
        query_dataset: DataSet,
        json_cfg: Optional[dict] = None,
        bitset: Optional[BitsetView] = None,
    ) -> "expected[list]":
        """Per-query exact-distance iterators (PrecomputedDistanceIterator,
        reference brute_force.cc AnnIterator + index_node.h:815-937)."""

        def impl():
            if base_dataset.is_sparse:
                from .models.sparse import brute_force_ann_iterator_sparse

                return brute_force_ann_iterator_sparse(
                    base_dataset, query_dataset, json_cfg or {}, bitset
                )
            cfg = BruteForceConfig()
            st, msg = Config.load(cfg, json_cfg or {}, Stage.ITERATOR)
            if st != Status.success:
                return expected.Err(st, msg)
            metric = normalize_metric(cfg.metric_type)
            err = _check_metric(base_dataset, metric)
            if err:
                return expected.Err(Status.invalid_metric_type, err)
            xq, b_dev, aux = _prep(base_dataset, query_dataset, metric)
            larger = D.larger_is_better(metric)
            keep = bitset.host_mask(base_dataset.rows) if bitset and not bitset.empty_view() else None
            iterators = []
            chunk = 256
            for s in range(0, xq.shape[0], chunk):
                q_dev = jax.device_put(xq[s : s + chunk])
                dmat = np.asarray(D.pairwise_distance(metric, q_dev, b_dev, aux))
                for r in range(dmat.shape[0]):
                    iterators.append(
                        PrecomputedDistanceIterator(dmat[r], keep, larger)
                    )
            return expected.Ok(iterators)

        return guarded_expected(impl)
