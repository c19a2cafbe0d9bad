"""MINHASH_LSH — banded MinHash LSH for MHJACCARD.

Behavioral parity target: reference src/index/minhash/minhash_lsh.h (584),
minhash_index_node.cc (338), minhash_util.{h,cc}: rows are MinHash signatures
(dim = total bits, elements of mh_element_bit_width bits); banded LSH buckets
with optional per-band Bloom prefilter (minhash_lsh.h:56-149), optional exact
MinHash-Jaccard rerank (mh_search_with_jaccard), batch search flag.

The MHJACCARD similarity between two signatures is the fraction of equal
hash elements; LSH bands trade recall for candidate-set size exactly as in
the reference. Candidate rerank is a vectorized equal-element count.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import numpy as np

from ..binaryset import BinarySet
from ..bitset import BitsetView
from ..config import BaseConfig, Config, Entry, Stage
from ..dataset import DataSet, GenResultDataSet, GenTensorDataSet
from ..factory import register_index
from ..feature import feature
from ..index_param import IndexEnum, metric as M, normalize_metric
from ..index_node import IndexNode, PrecomputedDistanceIterator
from ..io.serialize import read_sections, write_sections
from ..status import KnowhereException, Status, expected


class MinHashConfig(BaseConfig):
    mh_element_bit_width = Entry(int, default=32, range=(1, 64), stages=[Stage.TRAIN, Stage.SEARCH])
    mh_lsh_band = Entry(int, range=(1, 65536), stages=[Stage.TRAIN], allow_empty=True)
    mh_lsh_aligned_block_size = Entry(int, default=4096, range=(1, None), stages=[Stage.TRAIN])
    mh_lsh_code_in_mem = Entry(bool, default=True, stages=[Stage.DESERIALIZE, Stage.TRAIN])
    mh_lsh_shared_bloom_filter = Entry(bool, default=False, stages=[Stage.TRAIN])
    mh_lsh_bloom_false_positive_prob = Entry(float, default=0.01, range=(0.0, 1.0), stages=[Stage.TRAIN])
    refine_k = Entry(int, default=1, range=(1, None), stages=[Stage.SEARCH])
    with_raw_data = Entry(bool, default=False, stages=[Stage.TRAIN])
    mh_search_with_jaccard = Entry(bool, default=False, stages=[Stage.SEARCH])
    mh_lsh_batch_search = Entry(bool, default=False, stages=[Stage.SEARCH])


def _to_elements(rows: np.ndarray, dim_bits: int, width: int) -> np.ndarray:
    """Packed signature bytes -> (n, n_elem) uint64 hash elements."""
    n = rows.shape[0]
    n_elem = dim_bits // width
    bits = np.unpackbits(rows.view(np.uint8).reshape(n, -1), axis=1, bitorder="little")[:, :dim_bits]
    weights = (1 << np.arange(width, dtype=np.uint64))
    elems = bits.reshape(n, n_elem, width).astype(np.uint64) @ weights
    return elems


class MinHashLSHNode(IndexNode):
    def __init__(self, version: int, object=None):  # noqa: A002
        super().__init__(version, object)
        self.index_type = IndexEnum.INDEX_MINHASH_LSH
        self.data_type = "bin1"
        self._lock = threading.RLock()
        self._dim = 0
        self._width = 32
        self._n_band = 0
        self._elems: Optional[np.ndarray] = None  # (nb, n_elem) uint64
        self._raw: Optional[np.ndarray] = None  # packed signatures
        self._bands: List[Dict[int, List[int]]] = []

    def Train(self, dataset: DataSet, cfg: Config) -> Status:
        if normalize_metric(cfg.metric_type) != M.MHJACCARD:
            raise KnowhereException("MINHASH_LSH requires MHJACCARD", Status.invalid_metric_type)
        self._dim = dataset.dim
        self._width = int(cfg.mh_element_bit_width)
        if self._dim % self._width != 0:
            raise KnowhereException(
                f"dim {self._dim} not divisible by element width {self._width}", Status.invalid_args
            )
        n_elem = self._dim // self._width
        band = cfg.get("mh_lsh_band")
        self._n_band = int(band) if band else max(1, n_elem // 4)
        if n_elem % self._n_band != 0:
            raise KnowhereException(
                f"element count {n_elem} not divisible by band count {self._n_band}",
                Status.invalid_args,
            )
        return Status.success

    def Add(self, dataset: DataSet, cfg: Config) -> Status:
        rows = np.asarray(dataset.tensor)
        with self._lock:
            elems = _to_elements(rows, self._dim, self._width)
            base = 0 if self._elems is None else self._elems.shape[0]
            self._elems = elems if self._elems is None else np.concatenate([self._elems, elems])
            self._raw = rows if self._raw is None else np.concatenate([self._raw, rows])
            n_elem = self._elems.shape[1]
            rows_per_band = n_elem // self._n_band
            if not self._bands:
                self._bands = [dict() for _ in range(self._n_band)]
            for b in range(self._n_band):
                seg = elems[:, b * rows_per_band : (b + 1) * rows_per_band]
                # band signature hash (stable, order-sensitive)
                h = np.zeros(len(seg), dtype=np.uint64)
                for c in range(rows_per_band):
                    h = h * np.uint64(1099511628211) + seg[:, c]
                table = self._bands[b]
                for i, hv in enumerate(h.tolist()):
                    table.setdefault(hv, []).append(base + i)
        return Status.success

    def _band_hashes(self, elems: np.ndarray) -> List[np.ndarray]:
        n_elem = elems.shape[1]
        rows_per_band = n_elem // self._n_band
        out = []
        for b in range(self._n_band):
            seg = elems[:, b * rows_per_band : (b + 1) * rows_per_band]
            h = np.zeros(len(seg), dtype=np.uint64)
            for c in range(rows_per_band):
                h = h * np.uint64(1099511628211) + seg[:, c]
            out.append(h)
        return out

    def Search(self, dataset: DataSet, cfg: Config, bitset: BitsetView) -> "expected[DataSet]":
        with self._lock:
            if self._elems is None:
                return expected.Err(Status.empty_index, "index not built")
            if normalize_metric(cfg.metric_type) != M.MHJACCARD:
                return expected.Err(Status.invalid_metric_type, "MINHASH_LSH requires MHJACCARD")
            k = cfg.k
            q_rows = np.asarray(dataset.tensor)
            q_elems = _to_elements(q_rows, self._dim, self._width)
            nq = q_elems.shape[0]
            nb = self._elems.shape[0]
            keep = bitset.host_mask(nb) if not bitset.empty_view() else None
            hashes = self._band_hashes(q_elems)
            out_ids = np.full((nq, k), -1, np.int64)
            out_d = np.zeros((nq, k), np.float32)
            n_elem = self._elems.shape[1]
            for i in range(nq):
                cands: set = set()
                for b in range(self._n_band):
                    cands.update(self._bands[b].get(int(hashes[b][i]), ()))
                if keep is not None:
                    cands = {c for c in cands if keep[c]}
                if not cands:
                    continue
                cl = np.fromiter(cands, dtype=np.int64, count=len(cands))
                # MHJACCARD similarity = fraction of equal hash elements
                eq = (self._elems[cl] == q_elems[i][None, :]).mean(axis=1).astype(np.float32)
                order = np.argsort(-eq, kind="stable")[:k]
                out_ids[i, : len(order)] = cl[order]
                out_d[i, : len(order)] = eq[order]
            return expected.Ok(GenResultDataSet(nq, k, out_ids, out_d))

    def AnnIterator(self, dataset: DataSet, cfg: Config, bitset: BitsetView, use_knowhere_search_pool=True):
        with self._lock:
            if self._elems is None:
                return expected.Err(Status.empty_index, "index not built")
            q_elems = _to_elements(np.asarray(dataset.tensor), self._dim, self._width)
            nb = self._elems.shape[0]
            keep = bitset.host_mask(nb) if not bitset.empty_view() else None
            its = []
            for i in range(q_elems.shape[0]):
                sim = (self._elems == q_elems[i][None, :]).mean(axis=1).astype(np.float32)
                its.append(PrecomputedDistanceIterator(sim, keep, larger_is_closer=True))
            return expected.Ok(its)

    def GetVectorByIds(self, dataset: DataSet) -> "expected[DataSet]":
        with self._lock:
            if self._raw is None:
                return expected.Err(Status.empty_index, "index not built")
            ids = np.asarray(dataset.ids, dtype=np.int64)
            if ids.min(initial=0) < 0 or ids.max(initial=-1) >= len(self._raw):
                return expected.Err(Status.invalid_args, "id out of range")
            return expected.Ok(GenTensorDataSet(self._raw[ids], len(ids), self._dim))

    def HasRawData(self, metric_type: str = "MHJACCARD") -> bool:
        return True

    def Serialize(self, binset: BinarySet) -> Status:
        with self._lock:
            if self._raw is None:
                return Status.empty_index
            blob = write_sections(
                {"raw": self._raw},
                meta={"dim": self._dim, "width": self._width, "n_band": self._n_band},
            )
            binset.Append(self.Type(), blob)
            return Status.success

    def Deserialize(self, binset: BinarySet, cfg: Config) -> Status:
        binary = binset.GetByName(self.Type())
        if binary is None:
            return Status.invalid_binary_set
        arrays, meta = read_sections(binary.data)
        with self._lock:
            self._dim = int(meta["dim"])
            self._width = int(meta["width"])
            self._n_band = int(meta["n_band"])
            self._elems = None
            self._raw = None
            self._bands = []
            ds = DataSet()
            ds.set("tensor", np.asarray(arrays["raw"]))
            ds.rows = arrays["raw"].shape[0]
            ds.dim = self._dim
            return self.Add(ds, cfg)

    def Dim(self) -> int:
        return self._dim

    def Size(self) -> int:
        return 0 if self._elems is None else int(self._elems.nbytes)

    def Count(self) -> int:
        return 0 if self._elems is None else self._elems.shape[0]

    def Type(self) -> str:
        return self.index_type

    @staticmethod
    def CreateConfig() -> Config:
        return MinHashConfig()


register_index(
    IndexEnum.INDEX_MINHASH_LSH, ("bin1",), feature.BINARY | feature.KNN | feature.MMAP
)(MinHashLSHNode)
