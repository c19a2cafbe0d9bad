"""MINHASH_LSH — banded MinHash LSH for MHJACCARD.

Behavioral parity target: reference src/index/minhash/minhash_lsh.h (584),
minhash_index_node.cc (338), minhash_util.{h,cc}: rows are MinHash signatures
(dim = total bits, elements of mh_element_bit_width bits); banded LSH buckets
with per-band (or shared) Bloom prefilter (minhash_lsh.h:56-149), optional
exact MinHash-Jaccard rerank (mh_search_with_jaccard), batch search
(mh_lsh_batch_search).

Layout: the reference stores transposed band hash KV pairs in disk/mmap
blocks (minhash_lsh.h:283-294). Here each band's KV table is a pair of flat
arrays (hash sorted ascending, row ids in hash order) — probe = vectorized
binary search; the arrays serialize as sections (zero-copy/mmap-able on
load, no table rebuild). Bloom prefilters are vectorized double-hash bitmaps
serialized alongside.

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


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized over uint64 arrays."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


class VecBloom:
    """Vectorized Bloom filter over uint64 keys (reference per-band Bloom
    prefilter, minhash_lsh.h:56-149 / comp/bloomfilter.h). Double hashing
    h1 + i*h2 with splitmix64 mixing; add/contains are batched numpy."""

    def __init__(self, capacity: int, fpp: float, bits: Optional[np.ndarray] = None,
                 n_bits: int = 0, n_hashes: int = 0):
        import math

        if bits is not None:
            self.bits = bits
            self.n_bits = n_bits
            self.n_hashes = n_hashes
            return
        capacity = max(int(capacity), 1)
        p = min(max(fpp, 1e-9), 0.999)
        m = int(-capacity * math.log(p) / (math.log(2) ** 2)) + 1
        self.n_bits = max(64, m)
        self.n_hashes = max(1, int(round(m / capacity * math.log(2))))
        self.bits = np.zeros((self.n_bits + 7) // 8, dtype=np.uint8)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = _mix64(keys)
        h2 = _mix64(keys ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)).astype(np.int64)

    def add_many(self, keys: np.ndarray) -> None:
        pos = self._positions(np.asarray(keys, np.uint64)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(keys, np.uint64))
        hit = (self.bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return hit.all(axis=0)


class MinHashLSHNode(IndexNode):
    def __init__(self, version: int, object=None):  # noqa: A002
        super().__init__(version, object)
        self.index_type = IndexEnum.INDEX_MINHASH_LSH
        self.data_type = "bin1"
        self._lock = threading.RLock()
        self._dim = 0
        self._width = 32
        self._n_band = 0
        self._shared_bloom = False
        self._fpp = 0.01
        self._elems: Optional[np.ndarray] = None  # (nb, n_elem) uint64
        self._raw: Optional[np.ndarray] = None  # packed signatures
        # band KV tables: per band (hash sorted asc u64, row ids in that order)
        self._band_hash: Optional[np.ndarray] = None  # (n_band, nb) u64
        self._band_rows: Optional[np.ndarray] = None  # (n_band, nb) i64
        self._blooms: List[VecBloom] = []  # one per band, or [shared]
        self._tables_dirty = False
        self._last_search_stats: Dict[str, int] = {}

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
        self._shared_bloom = bool(cfg.get("mh_lsh_shared_bloom_filter", False))
        self._fpp = float(cfg.get("mh_lsh_bloom_false_positive_prob", 0.01) or 0.01)
        return Status.success

    def Add(self, dataset: DataSet, cfg: Config) -> Status:
        rows = np.asarray(dataset.tensor)
        with self._lock:
            elems = _to_elements(rows, self._dim, self._width)
            self._elems = elems if self._elems is None else np.concatenate([self._elems, elems])
            self._raw = rows if self._raw is None else np.concatenate([self._raw, rows])
            self._tables_dirty = True
        return Status.success

    def _band_hashes(self, elems: np.ndarray) -> np.ndarray:
        """(n_band, n) uint64 band signatures (FNV-folded, order-sensitive)."""
        n_elem = elems.shape[1]
        rpb = n_elem // self._n_band
        out = np.zeros((self._n_band, elems.shape[0]), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in range(self._n_band):
                seg = elems[:, b * rpb : (b + 1) * rpb]
                h = np.zeros(elems.shape[0], dtype=np.uint64)
                for c in range(rpb):
                    h = h * np.uint64(1099511628211) + seg[:, c]
                out[b] = h
        return out

    def _bloom_keys(self, band_idx: int, hashes: np.ndarray) -> np.ndarray:
        """Shared bloom mixes the band index into the key (reference
        mh_lsh_shared_bloom_filter: one filter for all bands)."""
        if not self._shared_bloom:
            return hashes
        with np.errstate(over="ignore"):
            return hashes ^ _mix64(np.full_like(hashes, band_idx + 1))

    def _ensure_tables(self) -> None:
        if not self._tables_dirty and self._band_hash is not None:
            return
        nb = self._elems.shape[0]
        bh = self._band_hashes(self._elems)  # (n_band, nb)
        self._band_hash = np.empty_like(bh)
        self._band_rows = np.empty((self._n_band, nb), np.int64)
        for b in range(self._n_band):
            order = np.argsort(bh[b], kind="stable")
            self._band_hash[b] = bh[b][order]
            self._band_rows[b] = order
        if self._shared_bloom:
            bloom = VecBloom(nb * self._n_band, self._fpp)
            for b in range(self._n_band):
                bloom.add_many(self._bloom_keys(b, bh[b]))
            self._blooms = [bloom]
        else:
            self._blooms = []
            for b in range(self._n_band):
                bloom = VecBloom(nb, self._fpp)
                bloom.add_many(bh[b])
                self._blooms.append(bloom)
        self._tables_dirty = False

    def _bloom_for(self, b: int) -> VecBloom:
        return self._blooms[0] if self._shared_bloom else self._blooms[b]

    def _probe_band(self, b: int, h: np.ndarray):
        """Vectorized KV probe: (lo, hi) candidate ranges per query hash."""
        lo = np.searchsorted(self._band_hash[b], h, side="left")
        hi = np.searchsorted(self._band_hash[b], h, side="right")
        return lo, hi

    def Search(self, dataset: DataSet, cfg: Config, bitset: BitsetView) -> "expected[DataSet]":
        with self._lock:
            if self._elems is None:
                return expected.Err(Status.empty_index, "index not built")
            if normalize_metric(cfg.metric_type) != M.MHJACCARD:
                return expected.Err(Status.invalid_metric_type, "MINHASH_LSH requires MHJACCARD")
            self._ensure_tables()
            k = cfg.k
            q_rows = np.asarray(dataset.tensor)
            q_elems = _to_elements(q_rows, self._dim, self._width)
            nq = q_elems.shape[0]
            nb = self._elems.shape[0]
            keep = bitset.host_mask(nb) if not bitset.empty_view() else None
            hashes = self._band_hashes(q_elems)  # (n_band, nq)

            # bloom prefilter: probe the KV table only where the filter says
            # the band hash may exist (minhash_lsh.h:56-149)
            bloom_hits = np.empty((self._n_band, nq), bool)
            for b in range(self._n_band):
                bloom_hits[b] = self._bloom_for(b).contains_many(
                    self._bloom_keys(b, hashes[b])
                )
            stats = {"bloom_skipped": int((~bloom_hits).sum()), "candidates": 0,
                     "probes": int(bloom_hits.sum())}

            # batch mode probes every band for the whole query batch in one
            # vectorized pass (reference mh_lsh_batch_search)
            batch = bool(cfg.get("mh_lsh_batch_search", False))
            cand_per_q: List[List[np.ndarray]] = [[] for _ in range(nq)]
            if batch:
                for b in range(self._n_band):
                    if not bloom_hits[b].any():
                        continue
                    lo, hi = self._probe_band(b, hashes[b])
                    for i in np.nonzero(bloom_hits[b] & (hi > lo))[0]:
                        cand_per_q[i].append(self._band_rows[b][lo[i] : hi[i]])
            else:
                for i in range(nq):
                    for b in range(self._n_band):
                        if not bloom_hits[b, i]:
                            continue
                        lo = np.searchsorted(self._band_hash[b], hashes[b, i], side="left")
                        hi = np.searchsorted(self._band_hash[b], hashes[b, i], side="right")
                        if hi > lo:
                            cand_per_q[i].append(self._band_rows[b][lo:hi])

            out_ids = np.full((nq, k), -1, np.int64)
            out_d = np.zeros((nq, k), np.float32)
            for i in range(nq):
                if not cand_per_q[i]:
                    continue
                cl = np.unique(np.concatenate(cand_per_q[i]))
                if keep is not None:
                    cl = cl[keep[cl]]
                if cl.size == 0:
                    continue
                stats["candidates"] += int(cl.size)
                # MHJACCARD similarity = fraction of equal hash elements
                eq = (self._elems[cl] == q_elems[i][None, :]).mean(axis=1).astype(np.float32)
                order = np.argsort(-eq, kind="stable")[:k]
                out_ids[i, : len(order)] = cl[order]
                out_d[i, : len(order)] = eq[order]
            self._last_search_stats = stats
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
        """Serializes raw signatures AND the band KV tables + bloom bitmaps
        (reference writes transposed band KV blocks, minhash_lsh.h:283-294) —
        Deserialize loads them without rebuilding."""
        with self._lock:
            if self._raw is None:
                return Status.empty_index
            self._ensure_tables()
            arrays = {
                "raw": self._raw,
                "band_hash": self._band_hash,
                "band_rows": self._band_rows,
                "bloom_bits": np.concatenate([bl.bits for bl in self._blooms]),
            }
            blob = write_sections(
                arrays,
                meta={
                    "dim": self._dim, "width": self._width, "n_band": self._n_band,
                    "shared_bloom": self._shared_bloom, "fpp": self._fpp,
                    "bloom_meta": [
                        {"n_bits": bl.n_bits, "n_hashes": bl.n_hashes, "nbytes": int(bl.bits.size)}
                        for bl in self._blooms
                    ],
                },
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
            self._shared_bloom = bool(meta.get("shared_bloom", False))
            self._fpp = float(meta.get("fpp", 0.01))
            self._raw = np.array(arrays["raw"])
            # decode signatures for the rerank; the LSH tables load as-is
            self._elems = _to_elements(self._raw, self._dim, self._width)
            if "band_hash" in arrays:
                self._band_hash = np.array(arrays["band_hash"])
                self._band_rows = np.array(arrays["band_rows"])
                self._blooms = []
                off = 0
                bits = np.asarray(arrays["bloom_bits"])
                for bm in meta["bloom_meta"]:
                    self._blooms.append(VecBloom(
                        1, self._fpp, bits=np.array(bits[off : off + bm["nbytes"]]),
                        n_bits=bm["n_bits"], n_hashes=bm["n_hashes"],
                    ))
                    off += bm["nbytes"]
                self._tables_dirty = False
            else:  # legacy blobs carried only the raw signatures
                self._band_hash = None
                self._tables_dirty = True
            return Status.success

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
