"""FLAT / BIN_FLAT — exact scan index.

Parity target: reference FlatIndexNode (src/index/flat/flat.cc:1-426) wrapping
faiss IndexFlat/IndexBinaryFlat with per-query thread fan-out
(flat.cc:98-142). Here the stored base lives in HBM once and every query batch
runs through the tiled MXU kNN kernel; the per-query fan-out becomes the batch
axis.

Features: KNN | MMAP | NO_TRAIN, all dense dtypes + bin1 (flat.cc:409-423).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np

from ..binaryset import BinarySet
from ..bitset import BitsetView
from ..config import BaseConfig, Config
from ..dataset import (
    DataSet,
    GenRangeResultDataSet,
    GenResultDataSet,
    GenTensorDataSet,
)
from ..factory import register_index
from ..feature import feature
from ..index_param import BINARY_METRICS, IndexEnum, normalize_metric
from ..index_node import IndexNode, PrecomputedDistanceIterator
from ..io.serialize import read_sections, write_sections
from ..ops import distances as D
from ..ops import range as R
from ..ops import topk as T
from ..status import KnowhereException, Status, expected


class FlatConfig(BaseConfig):
    """reference src/index/flat/flat_config.h:19 — BaseConfig only."""


class FlatIndexNode(IndexNode):
    def __init__(self, version: int, object=None):  # noqa: A002
        super().__init__(version, object)
        self.index_type = IndexEnum.INDEX_FAISS_IDMAP
        self.data_type = "fp32"
        self._xb: Optional[np.ndarray] = None  # stored rows (packed for bin1)
        self._dim = 0
        self._metric = "L2"
        # device caches
        self._dev = None  # compute-ready representation (unpacked for bin1)
        self._aux = None
        self._scan_stores = {}  # metric -> pallas_flat.FlatScanStore

    # --- helpers -----------------------------------------------------------
    def _is_binary(self) -> bool:
        return self.data_type == "bin1"

    def _ensure_device(self):
        if self._dev is None:
            if self._xb is None:
                raise KnowhereException("index is empty", Status.empty_index)
            xb = self._xb
            if self._is_binary():
                xb = D.unpack_bits_host(xb.view(np.uint8), self._dim)
            self._dev = jax.device_put(xb)
            self._aux = D.base_aux(self._metric, self._dev)
            # the device copy is the search structure; demote the host copy
            # to a disk-backed memmap (serialization/GetVectorByIds read it)
            from ..utils.spill import spill_array

            self._xb = spill_array(self._xb)
        return self._dev, self._aux

    def _prep_queries(self, dataset: DataSet) -> np.ndarray:
        xq = np.asarray(dataset.tensor)
        if self._is_binary():
            xq = D.unpack_bits_host(xq.view(np.uint8), self._dim)
        return xq

    def _check_metric(self, metric: str) -> None:
        binary = metric in BINARY_METRICS
        if binary != self._is_binary():
            raise KnowhereException(
                f"metric {metric} incompatible with data type {self.data_type}",
                Status.invalid_metric_type,
            )

    # --- lifecycle -----------------------------------------------------------
    def Train(self, dataset: DataSet, cfg: Config) -> Status:
        self._metric = normalize_metric(cfg.metric_type)
        self._check_metric(self._metric)
        return Status.success

    def Add(self, dataset: DataSet, cfg: Config) -> Status:
        xb = np.asarray(dataset.tensor)
        self._dim = dataset.dim
        if self._xb is None:
            self._xb = xb
        else:
            self._xb = np.concatenate([self._xb, xb], axis=0)
        self._dev = None  # invalidate device cache
        self._scan_stores = {}
        return Status.success

    # --- queries -----------------------------------------------------------
    def Search(self, dataset: DataSet, cfg: Config, bitset: BitsetView) -> "expected[DataSet]":
        import os

        metric = normalize_metric(cfg.metric_type)
        self._check_metric(metric)
        dev, aux = self._ensure_device()
        if metric != self._metric:
            aux = D.base_aux(metric, dev)
        xq = self._prep_queries(dataset)
        mask = bitset.device_mask(self.Count()) if not bitset.empty_view() else None
        # Default fast path on TPU: the two-phase exact Pallas scan
        # (ops/pallas_flat.py — 1M x 128: 21k QPS at k=10 / 9.8k at k=100 vs
        # 1.3k / 0.4k for the XLA streaming scan, recall 1.0). The XLA path
        # remains the oracle, the filtered path, and the CPU-test path.
        # KNOWHERE_FLAT_ENGINE=xla forces the oracle path.
        engine = os.environ.get("KNOWHERE_FLAT_ENGINE", "auto")
        if (
            engine != "xla"
            and mask is None
            and metric in ("L2", "IP", "COSINE")
            and not self._is_binary()
            and self.Count() >= 16384
            and cfg.k <= 1024
            and jax.default_backend() != "cpu"
        ):
            dists, ids = self._pallas_search(xq, cfg.k, metric)
            return expected.Ok(GenResultDataSet(dataset.rows, cfg.k, ids, dists))
        ids, dists = T.knn_search(xq, dev, cfg.k, metric, bitset_mask=mask, aux=aux)
        return expected.Ok(GenResultDataSet(dataset.rows, cfg.k, ids, dists))

    def _pallas_search(self, xq: np.ndarray, k: int, metric: str):
        """Two-phase exact scan; COSINE runs as IP over normalized copies."""
        from ..ops.pallas_flat import FlatScanStore, flat_topk

        store = self._scan_stores.get(metric)
        if store is None:
            dev, _ = self._ensure_device()
            if metric == "COSINE":
                import jax.numpy as jnp

                nrm = jnp.linalg.norm(dev.astype(jnp.float32), axis=1, keepdims=True)
                base = dev / jnp.maximum(nrm, 1e-12)
                store = FlatScanStore(base, None, False)
            else:
                store = FlatScanStore(dev, None, metric == "L2")
            self._scan_stores[metric] = store
        if metric == "COSINE":
            qn = np.linalg.norm(xq, axis=1, keepdims=True)
            xq = xq / np.maximum(qn, 1e-12)
        return flat_topk(xq, store, k)

    def RangeSearch(self, dataset: DataSet, cfg: Config, bitset: BitsetView) -> "expected[DataSet]":
        metric = normalize_metric(cfg.metric_type)
        self._check_metric(metric)
        dev, aux = self._ensure_device()
        if metric != self._metric:
            aux = D.base_aux(metric, dev)
        xq = self._prep_queries(dataset)
        mask = bitset.device_mask(self.Count()) if not bitset.empty_view() else None
        ids, dists, lims = R.range_search(
            xq, dev, cfg.radius, cfg.range_filter, metric, bitset_mask=mask, aux=aux
        )
        ids, dists, lims = R.apply_range_search_k(
            ids, dists, lims, cfg.get("range_search_k", -1), D.larger_is_better(metric)
        )
        return expected.Ok(GenRangeResultDataSet(dataset.rows, ids, dists, lims))

    def AnnIterator(
        self, dataset: DataSet, cfg: Config, bitset: BitsetView, use_knowhere_search_pool=True
    ) -> "expected[List]":
        metric = normalize_metric(cfg.metric_type)
        self._check_metric(metric)
        dev, aux = self._ensure_device()
        if metric != self._metric:
            aux = D.base_aux(metric, dev)
        xq = self._prep_queries(dataset)
        keep = bitset.host_mask(self.Count()) if not bitset.empty_view() else None
        larger = D.larger_is_better(metric)
        iterators: List[PrecomputedDistanceIterator] = []
        chunk = 256
        for s in range(0, xq.shape[0], chunk):
            q_dev = jax.device_put(xq[s : s + chunk])
            dmat = np.asarray(D.pairwise_distance(metric, q_dev, dev, aux))
            for r in range(dmat.shape[0]):
                iterators.append(PrecomputedDistanceIterator(dmat[r], keep, larger))
        return expected.Ok(iterators)

    def GetVectorByIds(self, dataset: DataSet) -> "expected[DataSet]":
        if self._xb is None:
            return expected.Err(Status.empty_index, "index not built")
        ids = np.asarray(dataset.ids, dtype=np.int64)
        if ids.min(initial=0) < 0 or ids.max(initial=-1) >= self.Count():
            return expected.Err(Status.invalid_args, "id out of range")
        out = self._xb[ids]
        return expected.Ok(GenTensorDataSet(out, len(ids), self._dim))

    def CalcDistByIDs(self, query_ds, bitset, ids, rows) -> "expected[np.ndarray]":
        """Exact distances queries x stored[ids] (for emb_list rerank)."""
        dev, _ = self._ensure_device()
        xq = self._prep_queries(query_ds)
        sub = jax.device_put(np.asarray(self._xb[ids]) if not self._is_binary() else D.unpack_bits_host(self._xb[ids].view(np.uint8), self._dim))
        q_dev = jax.device_put(xq)
        metric = self._metric
        dmat = np.asarray(D.pairwise_distance(metric, q_dev, sub, D.base_aux(metric, sub)))
        return expected.Ok(dmat)

    @staticmethod
    def HasRawData(metric_type: str) -> bool:
        return True

    # --- serialization ---------------------------------------------------------
    def Serialize(self, binset: BinarySet) -> Status:
        if self._xb is None:
            return Status.empty_index
        blob = write_sections(
            {"xb": self._xb},
            meta={
                "dim": self._dim,
                "metric": self._metric,
                "data_type": self.data_type,
                "index_type": self.Type(),
            },
        )
        binset.Append(self.Type(), blob)
        return Status.success

    def Deserialize(self, binset: BinarySet, cfg: Config) -> Status:
        binary = binset.GetByName(self.Type())
        if binary is None:
            return Status.invalid_binary_set
        arrays, meta = read_sections(binary.data)
        self._xb = arrays["xb"]
        self._dim = int(meta["dim"])
        self._metric = meta["metric"]
        self.data_type = meta.get("data_type", self.data_type)
        self._dev = None
        self._scan_stores = {}
        return Status.success

    # --- introspection -----------------------------------------------------------
    def Dim(self) -> int:
        return self._dim

    def Size(self) -> int:
        return 0 if self._xb is None else self._xb.nbytes

    def Count(self) -> int:
        return 0 if self._xb is None else self._xb.shape[0]

    def Type(self) -> str:
        return self.index_type

    @staticmethod
    def CreateConfig() -> Config:
        return FlatConfig()


register_index(
    IndexEnum.INDEX_FAISS_IDMAP,
    ("fp32", "fp16", "bf16", "int8"),
    feature.ALL_DENSE_TYPE | feature.MMAP | feature.KNN | feature.NO_TRAIN | feature.EMB_LIST,
)(FlatIndexNode)

register_index(
    IndexEnum.INDEX_FAISS_BIN_IDMAP,
    ("bin1",),
    feature.BINARY | feature.MMAP | feature.KNN | feature.NO_TRAIN,
)(FlatIndexNode)
# legacy alias (reference flat.cc:418 registers BINFLAT alongside BIN_FLAT)
register_index(
    "BINFLAT",
    ("bin1",),
    feature.BINARY | feature.MMAP | feature.KNN | feature.NO_TRAIN,
)(FlatIndexNode)

# TPU_BRUTE_FORCE alias (the reference's GPU_CUVS_BRUTE_FORCE equivalent)
register_index(
    IndexEnum.INDEX_TPU_BRUTEFORCE,
    ("fp32", "fp16", "bf16", "int8"),
    feature.ALL_DENSE_TYPE | feature.KNN | feature.NO_TRAIN | feature.GPU,
)(FlatIndexNode)
register_index(
    IndexEnum.INDEX_CUVS_BRUTEFORCE,
    ("fp32", "fp16", "bf16", "int8"),
    feature.ALL_DENSE_TYPE | feature.KNN | feature.NO_TRAIN | feature.GPU,
)(FlatIndexNode)
register_index(
    IndexEnum.INDEX_GPU_BRUTEFORCE,
    ("fp32", "fp16", "bf16", "int8"),
    feature.ALL_DENSE_TYPE | feature.KNN | feature.NO_TRAIN | feature.GPU,
)(FlatIndexNode)
# legacy faiss-GPU name (reference src/index/gpu/flat_gpu/flat_gpu.cc)
register_index(
    IndexEnum.INDEX_FAISS_GPU_IDMAP,
    ("fp32", "fp16", "bf16", "int8"),
    feature.ALL_DENSE_TYPE | feature.KNN | feature.NO_TRAIN | feature.GPU,
)(FlatIndexNode)
