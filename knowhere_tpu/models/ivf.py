"""IVF index family: IVF_FLAT[_CC], IVF_SQ8/IVF_SQ_CC, IVF_PQ, SCANN,
IVF_RABITQ[_FASTSCAN], BIN_IVF_FLAT.

Behavioral parity target: reference src/index/ivf/ivf.cc (1980 LoC) +
ivf_config.h — train via k-means coarse quantizer with nlist auto-shrink
(MatchNlist, ivf.cc:476-487), per-type construction incl. cosine
normalize-then-IP (ivf.cc:556-562, 990-993), search with
nprobe/ensure_topk_full/bitset filtering (ivf.cc:955-1210), SCANN =
4-bit PQ + raw refine with reorder_k (ivf.cc:659-694), RaBitQ binary
quantization with optional refine (ivf.cc:768-800), range search, iterators,
GetVectorByIds reconstruct (ivf.cc:1538-1607), serialize/mmap-deserialize
(ivf.cc:1723-1903), and CC concurrent-add variants (ivf.cc:605-631).

TPU design: lists live sorted-by-list in HBM; search batches queries and runs
the inverted (list-block x query-group) matmul task engine (ops/ivf_scan.py).
PQ/SQ decode on the fly inside the scan (== ADC results); RaBitQ scores via
sign-plane matmuls. The per-query thread fan-out of the reference becomes the
batch axis; CC semantics are epoch appends (pending segment scanned exactly).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..binaryset import BinarySet
from ..bitset import BitsetView
from ..config import BaseConfig, Config, Entry, Stage
from ..dataset import (
    DataSet,
    GenRangeResultDataSet,
    GenResultDataSet,
    GenTensorDataSet,
)
from ..factory import register_index
from ..feature import feature
from ..index_param import IndexEnum, metric as M, normalize_metric
from ..index_node import BatchedDistanceIterator, IndexNode
from ..io.serialize import read_sections, write_sections
from ..ops import distances as D
from ..ops import quant as Q
from ..ops.ivf_scan import build_scan_tasks, coarse_probe, ivf_scan_search
from ..ops.kmeans import assign_rows, kmeans
from ..ops.refine import RefineStore, refine_topk
from ..status import KnowhereException, Status, expected
from ..utils.logging import log_warning

MIN_POINTS_PER_CENTROID = 39  # reference ivf.cc:478


def _pad_q_rows(a: np.ndarray) -> np.ndarray:
    """Pad query batches to a shape ladder so jit shapes are reused: pow2 up
    to 8192, then multiples of 2048 (h2d runs at ~50MB/s once the process is
    past its first d2h — pow2 padding of a 10k batch would ship 60% extra)."""
    from ..ops.distances import pad_rows_ladder

    return pad_rows_ladder(a)


def match_nlist(rows: int, nlist: int) -> int:
    """nlist auto-shrink (reference MatchNlist, ivf.cc:476-487)."""
    if nlist * MIN_POINTS_PER_CENTROID > rows:
        new = max(1, rows // MIN_POINTS_PER_CENTROID)
        log_warning(f"nlist({nlist}) is too large, adjust to {new}")
        return new
    return nlist


def match_nbits(rows: int, nbits: int) -> int:
    """nbits auto-shrink so each PQ codebook can be trained (MatchNbits)."""
    while nbits > 1 and (1 << nbits) > max(rows, 2):
        nbits -= 1
    return nbits


# ---------------------------------------------------------------------------
# Configs (reference src/index/ivf/ivf_config.h; SURVEY Appendix A)
# ---------------------------------------------------------------------------


class IvfConfig(BaseConfig):
    nlist = Entry(int, default=128, range=(1, 65536), stages=[Stage.TRAIN])
    nprobe = Entry(int, default=8, range=(1, 65536), stages=[Stage.SEARCH, Stage.ITERATOR, Stage.RANGE_SEARCH])
    use_elkan = Entry(bool, default=True, stages=[Stage.TRAIN])
    ensure_topk_full = Entry(bool, default=True, stages=[Stage.SEARCH])
    max_empty_result_buckets = Entry(int, default=2, range=(0, 65536), stages=[Stage.RANGE_SEARCH])


class IvfFlatConfig(IvfConfig):
    pass


class IvfFlatCcConfig(IvfConfig):
    ssize = Entry(int, default=48, range=(32, 2048), stages=[Stage.TRAIN])


class IvfPqConfig(IvfConfig):
    m = Entry(int, range=(1, 65536), stages=[Stage.TRAIN], allow_empty=True)
    nbits = Entry(int, default=8, range=(1, 24), stages=[Stage.TRAIN])
    refine = Entry(bool, default=False, stages=[Stage.TRAIN])
    refine_type = Entry(str, stages=[Stage.TRAIN], allow_empty=True)
    refine_k = Entry(int, default=1, range=(1, None), stages=[Stage.SEARCH])
    # OPQ rotation before PQ (default ON — TPU-first: ADC candidate quality
    # sets nprobe@recall, the QPS-dominant knob; the reference reaches OPQ
    # only via faiss index-factory strings)
    opq = Entry(bool, default=True, stages=[Stage.TRAIN])


class ScannConfig(IvfConfig):
    reorder_k = Entry(int, range=(1, None), stages=[Stage.SEARCH], allow_empty=True)
    with_raw_data = Entry(bool, default=True, stages=[Stage.TRAIN])
    sub_dim = Entry(int, default=2, range=(1, 65536), stages=[Stage.TRAIN])
    ensure_topk_full = Entry(bool, default=False, stages=[Stage.SEARCH])


class IvfSqConfig(IvfConfig):
    sq_type = Entry(str, default="SQ8", stages=[Stage.TRAIN])
    refine = Entry(bool, default=False, stages=[Stage.TRAIN])
    refine_type = Entry(str, stages=[Stage.TRAIN], allow_empty=True)
    refine_k = Entry(int, default=1, range=(1, None), stages=[Stage.SEARCH])


class IvfSqCcConfig(IvfSqConfig):
    ssize = Entry(int, default=48, range=(32, 2048), stages=[Stage.TRAIN])
    code_size = Entry(int, default=8, range=(4, 8), stages=[Stage.TRAIN])
    raw_data_store_prefix = Entry(str, stages=[Stage.TRAIN], allow_empty=True)


class IvfRaBitQConfig(IvfConfig):
    rbq_bits = Entry(int, default=1, range=(1, 9), stages=[Stage.TRAIN])
    rbq_bits_query = Entry(int, default=0, range=(0, 8), stages=[Stage.SEARCH])
    refine = Entry(bool, default=True, stages=[Stage.TRAIN])
    refine_type = Entry(str, stages=[Stage.TRAIN], allow_empty=True)
    refine_k = Entry(int, default=1, range=(1, None), stages=[Stage.SEARCH])


# ---------------------------------------------------------------------------
# Node
# ---------------------------------------------------------------------------

_VARIANT_METRICS = {
    "flat": (M.L2, M.IP, M.COSINE),
    "flat_cc": (M.L2, M.IP, M.COSINE),
    "sq": (M.L2, M.IP, M.COSINE),
    "sq_cc": (M.L2, M.IP, M.COSINE),
    "pq": (M.L2, M.IP, M.COSINE),
    "scann": (M.L2, M.IP, M.COSINE),
    "rabitq": (M.L2, M.IP, M.COSINE),
    "rabitq_fastscan": (M.L2, M.IP, M.COSINE),
    "bin": (M.HAMMING, M.JACCARD),
}

_CONFIGS = {
    "flat": IvfFlatConfig,
    "flat_cc": IvfFlatCcConfig,
    "sq": IvfSqConfig,
    "sq_cc": IvfSqCcConfig,
    "pq": IvfPqConfig,
    "scann": ScannConfig,
    "rabitq": IvfRaBitQConfig,
    "rabitq_fastscan": IvfRaBitQConfig,
    "bin": IvfFlatConfig,
}


def _np_dtype_of(data_type: str):
    """knowhere data_type string -> numpy dtype (reference operands.h:48-120)."""
    if data_type == "fp16":
        return np.float16
    if data_type == "bf16":
        import ml_dtypes

        return ml_dtypes.bfloat16
    if data_type == "int8":
        return np.int8
    return np.float32


class IvfIndexNode(IndexNode):
    VARIANT = "flat"

    def __init__(self, version: int, object=None):  # noqa: A002
        super().__init__(version, object)
        self.index_type = IndexEnum.INDEX_FAISS_IVFFLAT
        self.data_type = "fp32"
        self._lock = threading.RLock()
        # single-writer lock (epoch merges): always acquired BEFORE self._lock
        self._writer_lock = threading.Lock()
        self._trained = False
        self._metric = M.L2
        self._dim = 0
        self._d_dev = 0  # device feature width (zero-padded to 128-mult)
        self._nlist = 0
        # codecs
        self._pq: Optional[Q.PQCodec] = None
        self._opq_rot: Optional[np.ndarray] = None  # OPQ rotation (d, d)
        self._sq: Optional[Q.SQCodec] = None
        self._rbq: Optional[Q.RaBitQCodec] = None
        self._refine_cfg: Optional[str] = None  # refine store kind or None
        # host state
        self._centroids: Optional[np.ndarray] = None
        self._xb_raw: Optional[np.ndarray] = None  # original-order raw rows (host)
        self._norms_raw: Optional[np.ndarray] = None  # cosine restore norms
        self._row_ids: Optional[np.ndarray] = None  # padded sorted pos -> row id (-1 pad)
        self._pos_of_row: Optional[np.ndarray] = None  # row id -> padded sorted pos
        self._offsets: Optional[np.ndarray] = None  # (nlist+1,) padded storage starts
        self._lengths: Optional[np.ndarray] = None  # (nlist,) TRUE list lengths
        self._count = 0  # true row count (storage may be block-aligned/padded)
        self._sorted_payload: Dict[str, np.ndarray] = {}
        # pending (CC) segment: raw rows + their list assignment
        self._pending_rows: List[np.ndarray] = []
        self._pending_count = 0
        # device state
        self._store: Optional[Dict[str, jax.Array]] = None
        self._kind = "raw"
        self._refine_store: Optional[RefineStore] = None
        self._sq_levels = 0
        self._sq_packed4 = False
        self._codes_nib = False  # ADC codes_t nibble-packed (4-bit fastscan)
        # fused-search jit cache, keyed by static search config; rebound by
        # _upload so epoch snapshots keep a cache consistent with their store
        self._fused_cache: Dict[tuple, "object"] = {}

    # --- helpers ---------------------------------------------------------
    def _is_binary(self) -> bool:
        return self.VARIANT == "bin"

    def _is_cc(self) -> bool:
        return self.VARIANT in ("flat_cc", "sq_cc")

    def _internal_metric(self) -> str:
        # cosine = normalize + IP (reference ivf.cc:556-562)
        if self._metric == M.COSINE:
            return M.IP
        if self._metric in (M.HAMMING, M.JACCARD):
            return self._metric
        return self._metric

    def _is_l2_like(self) -> bool:
        return self._internal_metric() in (M.L2, M.HAMMING)

    def _prep_rows(self, x: np.ndarray) -> np.ndarray:
        """Raw input rows -> compute representation (f32; bits unpacked;
        cosine-normalized)."""
        if self._is_binary():
            return D.unpack_bits_host(np.asarray(x).view(np.uint8), self._dim).astype(np.float32)
        x = np.asarray(x, dtype=np.float32) if x.dtype != np.float32 else np.asarray(x)
        x = x.astype(np.float32)
        if self._metric == M.COSINE:
            n = np.linalg.norm(x, axis=1, keepdims=True)
            n[n == 0] = 1.0
            x = x / n
        return x

    # --- Train ---------------------------------------------------------------
    def Train(self, dataset: DataSet, cfg: Config) -> Status:
        self._metric = normalize_metric(cfg.metric_type)
        if self._metric not in _VARIANT_METRICS["bin" if self._is_binary() else self.VARIANT]:
            raise KnowhereException(
                f"metric {self._metric} not supported by {self.Type()}",
                Status.invalid_metric_type,
            )
        x_in = np.asarray(dataset.tensor)
        rows = dataset.rows
        self._dim = dataset.dim
        x = self._prep_rows(x_in)

        self._nlist = match_nlist(rows, int(cfg.nlist))
        if cfg.get("use_elkan") is False:
            # ivf_config.h:33 use_elkan toggles Elkan's accelerated kmeans in
            # faiss. Elkan is an EXACT acceleration (identical assignments to
            # Lloyd); the TPU formulation is dense-matmul Lloyd, which is the
            # faster shape on the MXU, so both knob values run the same
            # (equivalent-result) algorithm. Logged so the choice is visible.
            from ..utils.logging import log_info

            log_info(
                "use_elkan=false requested: TPU kmeans always runs dense-matmul "
                "Lloyd (Elkan-equivalent fixed point; Elkan's distance-skip "
                "bookkeeping would not help the MXU)"
            )
        # cuVS-surface trainer knobs (models/cagra.py configs declare them;
        # plain IVF configs leave them unset -> defaults)
        n_iters = int(cfg.get("kmeans_n_iters", 12) or 12)
        frac = float(cfg.get("kmeans_trainset_fraction", 0.0) or 0.0)
        mppc = 256
        if frac > 0.0:
            mppc = max(1, int(rows * frac) // max(self._nlist, 1))
        centroids, assign_full = kmeans(
            x, self._nlist, n_iters=n_iters, seed=1234, max_points_per_centroid=mppc
        )
        if self._is_binary():
            # binary IVF: centroids snap to {0,1} bit planes (majority vote)
            centroids = (centroids > 0.5).astype(np.float32)
            assign_full = None  # snapped centroids invalidate the assignment
        self._centroids = centroids
        # reuse the full assignment in Add when Build=Train+Add runs on the
        # same rows (each re-assignment ships the whole corpus host->device)
        self._assign_cache = (
            (rows, float(x[:: max(rows // 7, 1), 0].sum()), assign_full)
            if assign_full is not None
            else None
        )

        # codec training
        if self.VARIANT == "pq":
            m = cfg.m if cfg.m is not None else max(1, self._dim // 2)
            if self._dim % m != 0:
                raise KnowhereException(
                    f"dim {self._dim} not divisible by m {m}", Status.invalid_args
                )
            nbits = match_nbits(rows, int(cfg.nbits))
            resid = x - centroids[assign_full]
            if cfg.get("opq", True) and rows >= 4 * (1 << nbits):
                self._opq_rot, self._pq = Q.opq_train(resid, int(m), nbits)
            else:
                self._opq_rot = None
                self._pq = Q.pq_train(resid, int(m), nbits)
            self._refine_cfg = self._refine_kind(cfg)
        elif self.VARIANT == "scann":
            sub_dim = int(cfg.sub_dim)
            if self._dim % sub_dim != 0:
                raise KnowhereException(
                    f"dim {self._dim} not divisible by sub_dim {sub_dim}", Status.invalid_args
                )
            m = self._dim // sub_dim
            resid = x - centroids[assign_full]
            self._pq = Q.pq_train(resid, m, match_nbits(rows, 4))
            self._refine_cfg = "raw" if cfg.with_raw_data else None
        elif self.VARIANT in ("sq", "sq_cc"):
            self._sq = Q.sq_train(x, cfg.sq_type or "SQ8")
            self._refine_cfg = self._refine_kind(cfg)
        elif self.VARIANT in ("rabitq", "rabitq_fastscan"):
            self._rbq = Q.rabitq_make(self._dim)
            self._refine_cfg = self._refine_kind(cfg) or ("raw" if cfg.get("refine", True) else None)

        self._trained = True
        return Status.success

    @staticmethod
    def _refine_kind(cfg: Config) -> Optional[str]:
        if not cfg.get("refine", False):
            return None
        rt = (cfg.get("refine_type") or "DATA_VIEW").upper()
        if rt in ("UINT8_QUANT", "UINT8", "SQ8"):
            return "sq8"
        if rt in ("FLOAT16_QUANT", "FP16"):
            return "fp16"
        if rt in ("BFLOAT16_QUANT", "BF16"):
            return "bf16"
        return "raw"

    # --- Add -------------------------------------------------------------------
    def Add(self, dataset: DataSet, cfg: Config) -> Status:
        if not self._trained:
            return Status.index_not_trained
        x_in = np.asarray(dataset.tensor)
        with self._writer_lock:
            if self._row_ids is not None:
                # post-build Add appends (reference plain-IVF accepts repeated
                # Add, ivf.cc:806-842; CC variants additionally allow it
                # concurrent with Search, ivf.cc:605-631). The pending list is
                # copy-on-write: in-flight search snapshots keep their epoch.
                with self._lock:
                    self._pending_rows = self._pending_rows + [x_in]
                    self._pending_count += x_in.shape[0]
                    need_merge = self._pending_count > max(4096, len(self._row_ids) // 4)
                if need_merge:
                    self._merge_pending_offlock()
                return Status.success
            with self._lock:
                self._build_storage(x_in)
        return Status.success

    def _build_storage(self, x_in: np.ndarray) -> None:
        from ..ops.ivf_pallas import LIST_ALIGN

        x = self._prep_rows(x_in)
        nb = x.shape[0]
        cache = getattr(self, "_assign_cache", None)
        if (
            cache is not None
            and cache[0] == nb
            and cache[1] == float(x[:: max(nb // 7, 1), 0].sum())
        ):
            assign = cache[2]  # Build=Train+Add on the same rows
        else:
            assign = assign_rows(x, self._centroids)
        self._assign_cache = None
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=self._nlist).astype(np.int64)
        self._count = nb
        self._lengths = counts
        # Large corpora: pad each list to a LIST_ALIGN-row multiple so every
        # scan block is ONE aligned slice — the Pallas kernel's scalar-
        # prefetched block DMA needs it (ops/ivf_pallas.py). Small corpora
        # keep the compact layout (padding would dominate memory).
        import os as _os

        align_min = int(_os.environ.get("KNOWHERE_IVF_ALIGN_MIN", 32768))
        align = LIST_ALIGN if nb >= align_min else 0
        if align:
            pad_counts = (counts + align - 1) // align * align
        else:
            pad_counts = counts
        self._offsets = np.zeros(self._nlist + 1, dtype=np.int64)
        np.cumsum(pad_counts, out=self._offsets[1:])
        nb_pad = int(self._offsets[-1])
        true_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        # destination (padded) position of each sorted row
        dst = np.arange(nb, dtype=np.int64) + np.repeat(
            self._offsets[:-1] - true_starts, counts
        )
        self._row_ids = np.full(nb_pad, -1, dtype=np.int64)
        self._row_ids[dst] = order
        self._pos_of_row = np.empty(nb, dtype=np.int64)
        self._pos_of_row[order] = dst

        def place(a_sorted: np.ndarray, fill=0) -> np.ndarray:
            """Scatter unpadded sorted rows into the aligned layout."""
            if nb_pad == nb:
                return a_sorted
            out = np.full((nb_pad, *a_sorted.shape[1:]), fill, a_sorted.dtype)
            out[dst] = a_sorted
            return out

        # host payloads (sorted order)
        x_sorted = x[order]
        if self.VARIANT in ("flat", "flat_cc", "bin"):
            if self._is_binary():
                self._sorted_payload = {
                    "bits": place(np.packbits(x_sorted.astype(np.uint8), axis=1, bitorder="little"))
                }
            else:
                # Native typed storage (reference distances_typed.cpp,
                # operands.h:48-120): fp16/bf16/int8 corpora keep their input
                # width end-to-end — host payload, serialization, and the
                # device store (scans cast per sliced block, so persistent
                # HBM stays native width). Cosine stores the normalized copy
                # in bf16 for typed inputs (normalization leaves int8/fp16
                # grids anyway).
                typed = self.data_type in ("fp16", "bf16", "int8")
                if self._metric != M.COSINE:
                    arr = np.asarray(x_in)
                    raw_sorted = arr[order] if typed else arr.astype(np.float32)[order]
                else:
                    if typed:
                        import ml_dtypes

                        raw_sorted = x_sorted.astype(ml_dtypes.bfloat16)
                    else:
                        raw_sorted = x_sorted
                    self._norms_raw = np.linalg.norm(
                        np.asarray(x_in, dtype=np.float32), axis=1
                    ).astype(np.float32)
                self._sorted_payload = {"data": place(raw_sorted)}
            self._xb_raw = None  # reconstruct from sorted payload
        elif self.VARIANT in ("pq", "scann"):
            resid = x - self._centroids[assign]
            if self._opq_rot is not None:
                resid = resid @ self._opq_rot.T
            codes = Q.pq_encode(self._pq, resid)
            self._sorted_payload = {"codes": place(codes[order])}
        elif self.VARIANT in ("sq", "sq_cc"):
            self._sorted_payload = {"codes": place(Q.sq_encode(self._sq, x_sorted))}
        elif self.VARIANT in ("rabitq", "rabitq_fastscan"):
            packed, r_norm, t = Q.rabitq_encode(self._rbq, x, self._centroids, assign)
            self._sorted_payload = {
                "signs_packed": place(packed[order]),
                "r_norm": place(r_norm[order]),
                "t": place(t[order], fill=1),
            }
        # refine store payload (padded sorted order so positions line up)
        if self._refine_cfg:
            if self._refine_cfg == "raw":
                self._sorted_payload["refine"] = place(x_sorted.astype(np.float32))
            elif self._refine_cfg == "sq8":
                sq = Q.sq_train(x_sorted, "SQ8")
                self._sorted_payload["refine"] = place(Q.sq_encode(sq, x_sorted))
                self._sorted_payload["refine_vmin"] = sq.vmin
                self._sorted_payload["refine_vdiff"] = sq.vdiff
            elif self._refine_cfg == "fp16":
                self._sorted_payload["refine"] = place(x_sorted.astype(np.float16))
            elif self._refine_cfg == "bf16":
                import ml_dtypes

                self._sorted_payload["refine"] = place(x_sorted.astype(ml_dtypes.bfloat16))
        self._upload()

    def _merge_pending(self) -> None:
        """Fold the pending CC segment into the sorted storage (epoch merge).
        Caller must hold BOTH self._writer_lock and self._lock."""
        if not self._pending_rows:
            return
        all_rows = [self._reconstruct_all()] if self._count else []
        all_rows.extend(self._pending_rows)
        merged = np.concatenate(all_rows, axis=0)
        self._pending_rows = []
        self._pending_count = 0
        self._row_ids = None
        self._build_storage(merged)

    def _merge_pending_offlock(self) -> None:
        """Epoch merge OFF the read lock: build the next storage epoch on a
        shadow node, then swap every field in one short locked pass. Searches
        snapshot under self._lock and keep scanning the OLD epoch throughout
        the rebuild — Add never blocks Search (reference CC add-during-search
        contract, ivf.cc:605-631, ConcurrentDirectMap). Caller must hold
        self._writer_lock (single writer); must NOT hold self._lock."""
        if not self._pending_rows:
            return
        all_rows = [self._reconstruct_all()] if self._count else []
        all_rows.extend(self._pending_rows)
        merged = np.concatenate(all_rows, axis=0)
        shadow = object.__new__(type(self))
        shadow.__dict__.update(self.__dict__)
        shadow._pending_rows = []
        shadow._pending_count = 0
        shadow._row_ids = None
        shadow._build_storage(merged)
        new_state = {
            k: v for k, v in shadow.__dict__.items()
            if k not in ("_lock", "_writer_lock")
        }
        with self._lock:
            self.__dict__.update(new_state)

    def _reconstruct_all(self) -> np.ndarray:
        """Original-order rows for re-merge: raw where stored, decoded codes
        otherwise (matches faiss reconstruct-based re-add semantics)."""
        if self._is_binary():
            return self._sorted_payload["bits"][self._pos_of_row]
        data = self._sorted_payload.get("data")
        if data is not None:
            out = data[self._pos_of_row]
            if self._metric == M.COSINE and self._norms_raw is not None:
                out = out * self._norms_raw[:, None]
            return out
        nb_pad = len(self._row_ids)
        dec = np.concatenate(
            [
                self._decode_sorted_block(s, min(s + 65536, nb_pad))
                for s in range(0, nb_pad, 65536)
            ],
            axis=0,
        )
        return dec[self._pos_of_row]

    def _upload(self) -> None:
        """Host payloads -> device store (pads B rows of slack at the end so
        block dynamic-slices never clamp into garbage).

        Feature-dim zero-padding: the Pallas scan kernels (ops/ivf_pallas)
        need d % 128 == 0 (MXU lane width); storing/querying with zero-padded
        columns leaves L2/IP/COSINE/HAMMING/JACCARD unchanged and unlocks the
        fast path for dims like GIST's 960 (round-2 bench ran the slow
        fallback there). Host payloads stay unpadded — only device arrays and
        device queries carry the padded width (self._d_dev)."""
        B_slack = 2048  # must cover the max adaptive block size
        d = self._dim
        sq4 = (
            self.VARIANT in ("sq", "sq_cc")
            and self._sq is not None
            and self._sq.sq_type == "SQ4"
        )
        if d > 64 and d % 128 != 0 and not sq4:
            self._d_dev = -(-d // 128) * 128
        else:
            self._d_dev = d
        dcol = self._d_dev - d

        def cpad(a: np.ndarray, fill=0) -> np.ndarray:
            if dcol == 0:
                return a
            width = [(0, 0)] * (a.ndim - 1) + [(0, dcol)]
            return np.pad(a, width, constant_values=fill)

        cents = jax.device_put(cpad(self._centroids))

        def pad(a: np.ndarray, fill=0) -> jax.Array:
            padding = np.full((B_slack, *a.shape[1:]), fill, a.dtype)
            return jax.device_put(np.concatenate([a, padding], axis=0))

        if self.VARIANT in ("flat", "flat_cc", "bin"):
            if self._is_binary():
                data = D.unpack_bits_host(self._sorted_payload["bits"], self._dim).astype(np.float32)
            else:
                data = self._sorted_payload["data"]
                if data.dtype == np.float16:
                    # device store in bf16 (MXU-native 2-byte width; fp16 is
                    # not an MXU input type). int8/bf16 upload as-is — the
                    # scan casts each sliced block (ivf_scan.py:230), so
                    # persistent HBM stays at native width.
                    import ml_dtypes

                    data = data.astype(ml_dtypes.bfloat16)
            # Single-pass padded fill + chunked norms. np.pad + concatenate +
            # a full-size float64 temp cost ~6 multi-GB single-threaded
            # passes on deserialize (measured: the 1Mx960 GIST load spent
            # ~10min of 1-core numpy here); one calloc'd buffer filled in row
            # chunks and an f64-accumulated einsum per chunk do the same
            # work in one streaming pass each.
            nb_rows = data.shape[0]
            buf = np.zeros((nb_rows + B_slack, self._d_dev), data.dtype)
            norms = np.zeros(nb_rows + B_slack, np.float32)
            ch = max(1, (256 << 20) // max(d * 4, 1))
            for i0 in range(0, nb_rows, ch):
                i1 = min(i0 + ch, nb_rows)
                c = np.asarray(data[i0:i1], dtype=np.float32)
                buf[i0:i1, :d] = c
                norms[i0:i1] = np.einsum("ij,ij->i", c, c, dtype=np.float64)
            self._store = {
                "data": jax.device_put(buf),
                "norms": jax.device_put(norms),
                "centroids": cents,
            }
            self._kind = "raw"
            self._build_int8_sidecar(data, cpad, pad)
        elif self.VARIANT in ("pq", "scann"):
            self._store = {
                "codes": pad(self._sorted_payload["codes"]),
                "codebooks": jax.device_put(self._pq.codebooks),
                "centroids": cents,
            }
            self._kind = "pq"
            # OPQ: codes live in the ROTATED frame (y = (x-c) @ R.T). The
            # whole scan runs there — queries rotate on device (rot_t), the
            # centroid terms use rotated centroids (cent_scan) — while the
            # coarse probe and exact refine stay in the original frame
            # (rotation preserves L2/IP).
            cents_scan_h = self._centroids
            if self._opq_rot is not None:
                cents_scan_h = (self._centroids @ self._opq_rot.T).astype(np.float32)
                rot_t = self._opq_rot.T.astype(np.float32)
                if dcol:
                    rot_t = np.pad(rot_t, ((0, dcol), (0, dcol)))
                self._store["rot_t"] = jax.device_put(rot_t)
                self._store["cent_scan"] = jax.device_put(cpad(cents_scan_h))
            # block-aligned storage extras for the Pallas ADC kernel
            # (ops/ivf_pallas.pallas_adc_tasks): transposed codes so each task
            # block is one aligned (m_pad, B) slice, plus the per-list CLUT
            # (centroid/codebook cross terms of the residual L2 expansion).
            from ..ops.ivf_pallas import LIST_ALIGN as _LA

            from ..ops.ivf_pallas import adc_mc_geometry

            offs = self._offsets
            self._codes_nib = False  # re-derived with codes_t below
            mk = self._pq.m * self._pq.ksub
            # kernel envelope: <=8192-entry LUTs take the single-grid kernel
            # (u8 codes_t); larger m (GIST m=96) takes the m-chunked kernel
            # when a VMEM-feasible geometry exists (i32 codes_t — per-chunk
            # u8 slices would violate the 32-sublane tile); otherwise skip
            # the extras (~200MB dead weight) and ride the XLA fallback
            geom = adc_mc_geometry(self._pq.m, self._pq.ksub, self._d_dev)
            if (
                offs is not None
                and int(offs[-1]) > 0
                and (offs % _LA == 0).all()
                and self._d_dev % 128 == 0
                and (mk <= 8192 or geom is not None)
            ):
                codes_sorted = self._sorted_payload["codes"]  # (nb_pad, m) u8
                m = codes_sorted.shape[1]
                nib = self._pq.ksub == 16 and m % 2 == 0 and mk <= 8192
                if nib:
                    # 4-bit fastscan layout (reference IndexIVFPQFastScan
                    # packs 2 codes/byte for the SIMD shuffle; here it halves
                    # resident bytes AND scan HBM traffic): byte row r =
                    # subspace r (low nibble) | subspace r + m/2 (high)
                    half = m // 2
                    packed = (
                        codes_sorted[:, :half] | (codes_sorted[:, half:] << 4)
                    ).T
                    m_pad = (half + 31) // 32 * 32
                    ct = np.zeros((m_pad, codes_sorted.shape[0]), np.uint8)
                    ct[:half] = packed
                elif mk <= 8192:
                    # u8 transposed codes (Mosaic u8 min tile is 32
                    # sublanes): 4x less HBM than the r3 i32 layout; the
                    # kernel widens the whole block to i32 once in VMEM
                    m_pad = (m + 31) // 32 * 32
                    ct = np.zeros((m_pad, codes_sorted.shape[0]), np.uint8)
                    ct[:m] = codes_sorted.T
                else:
                    ct = np.zeros((m, codes_sorted.shape[0]), np.int32)
                    ct[:m] = codes_sorted.T
                self._store["codes_t"] = jax.device_put(ct)
                # static layout flag — kept OFF the store dict (the fused
                # search jits over the store; a bool leaf would trace)
                self._codes_nib = nib
                books = self._pq.codebooks  # (m, ksub, sub_dim)
                ksub = books.shape[1]
                sub_dim = books.shape[2]
                if self._is_l2_like():
                    c3 = cents_scan_h.reshape(self._nlist, m, sub_dim)
                    clut = 2.0 * np.einsum(
                        "lms,mvs->lmv", c3.astype(np.float64), books.astype(np.float64)
                    ) + np.sum(books.astype(np.float64) ** 2, axis=-1)[None]
                    clut = clut.astype(np.float32)
                else:
                    clut = np.zeros((self._nlist, m, ksub), np.float32)
                self._store["clut"] = jax.device_put(
                    clut.reshape(self._nlist, m * ksub)
                ).astype(jnp.bfloat16)
                # block-diagonal codebooks: the kernel computes each task's
                # QLUT as ONE dense MXU matmul qs @ books_bd (ivf_pallas);
                # rows beyond self._dim stay zero (padded query cols hit them)
                books_bd = np.zeros((self._d_dev, m * ksub), np.float32)
                for i in range(m):
                    books_bd[
                        i * sub_dim : (i + 1) * sub_dim, i * ksub : (i + 1) * ksub
                    ] = books[i].T
                self._store["books_bd"] = jax.device_put(books_bd).astype(jnp.bfloat16)
                # the ADC kernel serves the hot path off codes_t; the
                # untransposed copy is only needed by the XLA fallback
                # (exact precision / iterators) and materializes lazily
                # (_ensure_pq_codes_dev) — ~m bytes/vec HBM saved
                del self._store["codes"]
        elif self.VARIANT in ("sq", "sq_cc"):
            t = self._sq.sq_type
            codes_payload = self._sorted_payload["codes"]
            if t != "SQ4":
                # padded columns decode to 0 (vmin=vdiff=0 below)
                codes_payload = cpad(codes_payload)
            self._store = {"codes": pad(codes_payload), "centroids": cents}
            if t in ("SQ4", "SQ6", "SQ8"):
                self._store["vmin"] = jax.device_put(cpad(self._sq.vmin))
                self._store["vdiff"] = jax.device_put(cpad(self._sq.vdiff))
                self._sq_levels = self._sq.levels
                self._sq_packed4 = t == "SQ4"
                if t == "SQ8":
                    self._build_sq8_int8_sidecar(cpad, pad)
            else:
                self._sq_levels = 0
                self._sq_packed4 = False
            self._kind = "sq"
        elif self.VARIANT in ("rabitq", "rabitq_fastscan"):
            signs01 = D.unpack_bits_host(self._sorted_payload["signs_packed"], self._dim)
            # padded sign columns are 0 (not +-1) so they contribute nothing
            signs = cpad((signs01.astype(np.int8) * 2 - 1).astype(np.int8))
            rot_t = self._rbq.rotation.T.astype(np.float32)
            if dcol:
                # zero-extend both axes: padded query cols hit zero rows,
                # padded sign cols read zero outputs
                rot_t = np.pad(rot_t, ((0, dcol), (0, dcol)))
            self._store = {
                "signs": pad(signs),
                "r_norm": pad(self._sorted_payload["r_norm"]),
                "t": pad(self._sorted_payload["t"], fill=1),
                "centroids": cents,
                "rot_t": jax.device_put(rot_t),
                "centroids_rot": jax.device_put(
                    cpad((self._centroids @ self._rbq.rotation.T).astype(np.float32))
                ),
            }
            # block-aligned per-row corrections for the Pallas RaBitQ kernel
            # ((1,1,B) streams; ops/ivf_pallas._rbq_kernel)
            from ..ops.ivf_pallas import LIST_ALIGN as _LA

            offs = self._offsets
            if (
                offs is not None
                and int(offs[-1]) > 0
                and (offs % _LA == 0).all()
                and self._d_dev % 128 == 0
            ):
                nb_pad = int(offs[-1])
                self._store["rn_blk"] = jax.device_put(
                    self._sorted_payload["r_norm"][:nb_pad]
                    .astype(np.float32)
                    .reshape(nb_pad // _LA, 1, _LA)
                )
                self._store["t_blk"] = jax.device_put(
                    self._sorted_payload["t"][:nb_pad]
                    .astype(np.float32)
                    .reshape(nb_pad // _LA, 1, _LA)
                )
            self._kind = "rabitq"
        # refine store (column-padded to match the padded device queries;
        # sq8 pads vmin/vdiff with zeros so extra columns decode to 0)
        if self._refine_cfg and "refine" in self._sorted_payload:
            if self._refine_cfg == "sq8":
                self._refine_store = RefineStore(
                    "sq8",
                    jax.device_put(cpad(self._sorted_payload["refine"])),
                    jax.device_put(cpad(self._sorted_payload["refine_vmin"])),
                    jax.device_put(cpad(self._sorted_payload["refine_vdiff"])),
                )
            else:
                self._refine_store = RefineStore(
                    "raw", jax.device_put(cpad(self._sorted_payload["refine"]))
                )
        # device list geometry for the on-device task builder (one h2d per
        # upload, not per search), and a fresh fused-search cache bound to
        # this store epoch
        self._store["offsets_dev"] = jax.device_put(
            np.asarray(self._offsets, dtype=np.int32)
        )
        self._store["lens_dev"] = jax.device_put(
            np.asarray(self._lengths, dtype=np.int32)
        )
        self._fused_cache = {}
        # demote resident host payloads to disk-backed memmaps: the device
        # store is the search structure; host arrays only feed Serialize /
        # GetVectorByIds / epoch re-merges (equal-memory north star)
        from ..utils.spill import spill_dict

        spill_dict(self._sorted_payload)

    def _build_int8_sidecar(self, data: np.ndarray, cpad, pad) -> None:
        """int8 fast-scan sidecar for raw f32 stores (ivf_pallas._int8_kernel):
        per-dim symmetric codes (centered for L2) + exact centered norms per
        block. v5e's MXU ranks int8 at 2x the bf16 rate (measured 247 TOP/s vs
        151 TFLOP/s in the task shape), and the search re-ranks the merged
        candidate pool exactly from the raw store, so recall at the same
        nprobe is preserved (reference speed-family analog: IVF_SQ8,
        src/index/ivf/ivf.cc). Derived data — rebuilt on every _upload, never
        serialized."""
        import os as _os

        if _os.environ.get("KNOWHERE_DISABLE_INT8_SCAN") == "1":
            return
        if self._is_binary() or data.dtype != np.float32:
            return
        offs = self._offsets
        from ..ops.ivf_pallas import LIST_ALIGN as _LA

        if (
            offs is None
            or int(offs[-1]) == 0
            or not (offs % _LA == 0).all()
            or self._d_dev % 128 != 0
        ):
            return
        nb_pad = int(offs[-1])
        x = data[:nb_pad]  # view; chunks cast below (full-size temps cost
        # ~25GB of 1-core numpy traffic at GIST scale — measured 704s loads)
        d = x.shape[1]
        n_true = int(np.asarray(self._lengths).sum())
        ch = max(1, (256 << 20) // max(d * 4, 1))
        if self._is_l2_like() and n_true > 0:
            acc = np.zeros(d, np.float64)
            for i0 in range(0, nb_pad, ch):  # pad rows are zeros
                acc += np.asarray(x[i0 : i0 + ch], np.float32).sum(
                    0, dtype=np.float64
                )
            mu = (acc / n_true).astype(np.float32)
        else:
            mu = np.zeros(d, np.float32)
        amax = np.zeros(d, np.float32)
        for i0 in range(0, nb_pad, ch):
            c = np.asarray(x[i0 : i0 + ch], np.float32) - mu
            np.abs(c, out=c)
            np.maximum(amax, c.max(0), out=amax)
        s = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
        inv = (1.0 / s).astype(np.float32)
        # padded int8 buffer filled directly (skip the pad+cpad copies)
        pad_rows = int(self._store["data"].shape[0]) - nb_pad
        codes = np.zeros((nb_pad + pad_rows, self._d_dev), np.int8)
        nrm = np.empty(nb_pad, np.float32)
        for i0 in range(0, nb_pad, ch):
            i1 = min(i0 + ch, nb_pad)
            c = np.asarray(x[i0:i1], np.float32) - mu
            nrm[i0:i1] = np.einsum("ij,ij->i", c, c, dtype=np.float64)
            c *= inv
            np.rint(c, out=c)
            np.clip(c, -127, 127, out=c)
            codes[i0:i1, :d] = c.astype(np.int8)
        self._store["data_i8"] = jax.device_put(codes)
        self._store["i8_nrm_blk"] = jax.device_put(
            nrm.reshape(nb_pad // _LA, 1, _LA)
        )
        self._store["i8_scale"] = jax.device_put(cpad(s))
        self._store["i8_mu"] = jax.device_put(cpad(mu))

    def _build_sq8_int8_sidecar(self, cpad, pad) -> None:
        """int8 fast-scan sidecar for SQ8 stores: the affine grid
        x_hat_j = vmin_j + (c_j+0.5)*s_j (s = vdiff/levels) factors into the
        SAME symmetric int8 estimator the raw sidecar uses —
            q . x_hat = const_q + sum_j (q_j s_j)(c_j - 128)
        so data_i8 = codes-128, the query transform multiplies by s (mu=0),
        and the per-query constant drops in the per-row top-k. Exact norms
        ||x_hat||^2 stream per block; the candidate pool re-ranks
        exact-under-stored-values via the SQ8 refine decode. Reference speed
        family: IVF_SQ8 (src/index/ivf/ivf.cc)."""
        import os as _os

        if _os.environ.get("KNOWHERE_DISABLE_INT8_SCAN") == "1":
            return
        offs = self._offsets
        from ..ops.ivf_pallas import LIST_ALIGN as _LA

        if (
            offs is None
            or int(offs[-1]) == 0
            or not (offs % _LA == 0).all()
            or self._d_dev % 128 != 0
        ):
            return
        nb_pad = int(offs[-1])
        codes = np.asarray(self._sorted_payload["codes"][:nb_pad])
        if codes.shape[1] != self._dim:
            return
        s = (self._sq.vdiff.astype(np.float32) / float(self._sq.levels))
        # chunked decode: no full-size f32/f64 decode temps (1-core host)
        nrm = np.empty(nb_pad, np.float32)
        ch = max(1, (256 << 20) // max(codes.shape[1] * 4, 1))
        for i0 in range(0, nb_pad, ch):
            i1 = min(i0 + ch, nb_pad)
            dec = self._sq.vmin[None, :] + (
                codes[i0:i1].astype(np.float32) + 0.5
            ) * s[None, :]
            nrm[i0:i1] = np.einsum("ij,ij->i", dec, dec, dtype=np.float64)
        # the scan reads the ALREADY-RESIDENT u8 codes (recentered in-kernel
        # via xor 0x80) — only the norms/scale sidecar is added, no i8 copy
        self._store["i8_nrm_blk"] = jax.device_put(nrm.reshape(nb_pad // _LA, 1, _LA))
        self._store["i8_scale"] = jax.device_put(cpad(s.astype(np.float32)))
        self._store["i8_mu"] = jax.device_put(np.zeros(self._d_dev, np.float32))

    def _ensure_pq_codes_dev(self, k_scan: int, nq_pad: int, scan_prec: str,
                             has_mask: bool) -> None:
        """Materialize the untransposed PQ codes on device ONLY when the
        coming scan will take the XLA fallback (_upload drops them from HBM
        because the Pallas ADC kernel reads codes_t)."""
        if self._kind != "pq" or "codes" in self._store:
            return
        from ..ops.ivf_pallas import pallas_adc_available

        if scan_prec != "exact" and pallas_adc_available(
            self._store, self._d_dev, k_scan, self._offsets, has_mask,
            nq_pad=nq_pad,
        ):
            return
        codes = np.asarray(self._sorted_payload["codes"])
        padding = np.zeros((2048, codes.shape[1]), codes.dtype)
        self._store["codes"] = jax.device_put(np.concatenate([codes, padding]))

    # --- Search ---------------------------------------------------------------
    def _prep_queries(self, dataset: DataSet) -> np.ndarray:
        xq = self._prep_rows(np.asarray(dataset.tensor))
        return xq

    def _pad_q_host(self, xq: np.ndarray) -> np.ndarray:
        """Row ladder + feature-dim zero-padding to the device width (_upload
        pads the stores; queries must match)."""
        q = _pad_q_rows(xq)
        d_dev = getattr(self, "_d_dev", 0) or q.shape[1]
        if q.shape[1] != d_dev:
            q = np.pad(q, ((0, 0), (0, d_dev - q.shape[1])))
        return q

    def _fused_search_fn(
        self, nprobe_cur: int, k_scan: int, scan_prec: str, has_mask: bool,
        is_jac: bool, mode_tag: str, k_final: int,
    ):
        """ONE-dispatch search: coarse probe -> on-device task build
        (build_scan_tasks_jax) -> scan kernels -> merge -> (refine) -> packed
        results, all inside a single jit. Every separate dispatch costs ~20ms
        flat over the axon tunnel (measured r3 phase profile: the unfused
        path paid it ~10-15x per search), so the whole search compiles into
        one XLA program and the host reads back exactly once."""
        key = (nprobe_cur, k_scan, scan_prec, has_mask, is_jac, mode_tag, k_final)
        fn = self._fused_cache.get(key)
        if fn is not None:
            return fn
        from ..ops.ivf_scan import coarse_probe as _cp, ivf_scan_search as _scan
        from ..ops.ivf_scan import pack_results as _pack
        from ..ops.refine import RefineStore as _RS, refine_topk_device as _ref

        kind = self._kind
        offsets, lens = self._offsets, self._lengths
        sq_levels, sq_packed4 = self._sq_levels, self._sq_packed4
        codes_nib = self._codes_nib
        is_l2 = self._is_l2_like()
        refine_kind = None if self._refine_store is None else self._refine_store.kind

        def run(q_pad_dev, n_valid, store, keep_sorted, r_data, r_vmin, r_vdiff):
            q_scan = q_pad_dev
            if "rot_t" in store:  # rabitq rotation / PQ OPQ frame
                q_scan = jnp.dot(q_pad_dev, store["rot_t"])
            probes = _cp(
                q_pad_dev, store["centroids"], nprobe=nprobe_cur, is_l2=is_l2
            )
            # padded query rows would otherwise probe nprobe REAL lists each
            # (pad_rows_ladder can nearly double small batches — ADVICE r3):
            # mask them to -1 so the task builder drops the pairs
            row = jax.lax.broadcasted_iota(jnp.int32, probes.shape, 0)
            probes = jnp.where(row < n_valid, probes, -1)
            s, p = _scan(
                q_scan, store, kind, probes, offsets, k_scan, is_l2,
                keep_sorted=keep_sorted if has_mask else None,
                sq_levels=sq_levels, sq_packed4=sq_packed4,
                is_jaccard=is_jac, prec=scan_prec, return_device=True,
                list_lengths=lens, codes_nib=codes_nib,
            )
            if mode_tag == "two_stage":
                if kind == "sq":
                    rs2 = _RS("sq8", store["codes"], store["vmin"], store["vdiff"])
                else:
                    rs2 = _RS("raw", store["data"])
                s, p = _ref(q_pad_dev, rs2, p, k_final, is_l2)
            elif mode_tag == "refine":
                s, p = _ref(
                    q_pad_dev, _RS(refine_kind, r_data, r_vmin, r_vdiff), p,
                    k_final, is_l2,
                )
            return _pack(s, p)

        fn = jax.jit(run)
        # bounded cache (ADVICE r3): knob-ladder sweeps within one store epoch
        # would otherwise accumulate compiled executables without limit
        while len(self._fused_cache) >= 32:
            self._fused_cache.pop(next(iter(self._fused_cache)))
        self._fused_cache[key] = fn
        return fn

    def _fused_eligible(self, k_scan: int, nq_pad: int, scan_prec: str,
                        has_mask: bool, is_jac: bool) -> bool:
        """Fuse when the scan will take a Pallas kernel path (the XLA decode
        fallback can expand to hundreds of inlined dispatches for huge-m PQ,
        where one program would compile forever)."""
        import os as _os

        if _os.environ.get("KNOWHERE_FORCE_FUSED") == "1":
            return True
        if _os.environ.get("KNOWHERE_DISABLE_FUSED") == "1":
            return False
        from ..ops.ivf_pallas import (
            pallas_adc_available, pallas_rbq_available, pallas_scan_available,
            pallas_sq_available,
        )

        st = self._store
        if self._kind == "pq" and scan_prec != "exact":
            return pallas_adc_available(
                st, self._d_dev, k_scan, self._offsets, has_mask, nq_pad=nq_pad
            )
        if self._kind in ("raw", "sq") and scan_prec == "int8":
            from ..ops.ivf_pallas import pallas_int8_available

            return pallas_int8_available(st, self._d_dev, k_scan, self._offsets)
        if self._kind == "raw" and st["data"].dtype == jnp.float32:
            return pallas_scan_available(
                "raw", self._d_dev, k_scan, nq_pad, self._offsets, has_mask,
                is_jac, scan_prec,
            )
        if self._kind == "rabitq" and scan_prec != "exact":
            return pallas_rbq_available(st, self._d_dev, k_scan, nq_pad, self._offsets)
        if self._kind == "sq":
            return pallas_sq_available(
                self._d_dev, st["codes"].shape[1], k_scan, nq_pad,
                self._offsets, has_mask, self._sq_levels, self._sq_packed4,
                scan_prec,
            )
        return False

    def _search_batch(
        self,
        xq: np.ndarray,
        k: int,
        nprobe: int,
        keep_sorted: Optional[jax.Array],
        n_valid: int,
        ensure_topk_full: bool,
        refine_k: int = 1,
        reorder_k: Optional[int] = None,
        q_pad_dev: Optional[jax.Array] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (dists (nq,k) native convention, ids (nq,k) original rows)."""
        from ..comp import check_current_cancellation  # noqa: F811

        check_current_cancellation()  # per-dispatch (ivf.cc:962 analog)
        nq = xq.shape[0]
        is_l2 = self._is_l2_like()
        internal = self._internal_metric()
        nb = len(self._row_ids)

        # coarse candidate count before refine
        k_coarse = k
        if self._refine_store is not None:
            if reorder_k is not None:
                k_coarse = max(k, reorder_k)
            else:
                k_coarse = max(k, k * max(1, refine_k))

        # Precision strategy (SURVEY north-star: speed at recall>=target):
        # - EXACT: full-fp32 scan. - FAST: single 3-pass-bf16 scan (~fp32
        #   ranking; measured recall .999+ on SIFT-like 1M). - BF16: raw bf16
        #   scan; for RAW float data it widens to 4k candidates + exact refine
        #   (two-stage) since single-pass bf16 alone caps recall. Binary
        #   metrics always scan bf16 (0/1 inputs, fp32 accumulate — exact);
        #   quantized codecs scan bf16 (decode noise dominates).
        from ..ops.distances import DistancePrecision, get_distance_precision

        gp = get_distance_precision()
        if gp == DistancePrecision.EXACT:
            scan_prec = "exact"
        elif self._is_binary() or self._kind in ("pq", "sq", "rabitq"):
            scan_prec = "bf16"
        elif gp == DistancePrecision.BF16:
            scan_prec = "bf16"
        else:
            scan_prec = "fast"
        two_stage = (
            gp == DistancePrecision.BF16
            and self._kind == "raw"
            and self._refine_store is None
            and not self._is_binary()
        )
        k_scan = k_coarse
        if two_stage:
            k_scan = min(max(4 * k_coarse, 32), max(nb, 1))
        # int8 MXU candidate generation (r4): raw f32 and SQ8 stores carry an
        # int8 sidecar (_build_int8_sidecar / _build_sq8_int8_sidecar); the
        # scan ranks 8-bit at ~2x the bf16 MXU rate and the widened candidate
        # pool is re-ranked EXACTLY (raw rows for flat, decoded SQ8 values
        # for the sq family — the reference's exact-under-stored contract),
        # so returned distances are exact and recall at equal nprobe holds.
        if (
            gp != DistancePrecision.EXACT
            and self._kind in ("raw", "sq")
            and not self._is_binary()
            and internal != M.JACCARD
            and "i8_nrm_blk" in self._store
        ):
            scan_prec = "int8"
            if self._refine_store is None:
                two_stage = True
            k_scan = min(max(4 * k_coarse, 48), max(nb, 1))

        # Sync discipline: every device sync on this platform costs ~30ms flat
        # (the axon tunnel degrades after the first d2h of the process), so a
        # search chains ALL device work asynchronously and reads back exactly
        # twice: probes for the host scheduler, then the packed final results.
        from ..ops.ivf_scan import pack_results, unpack_results
        from ..ops.refine import refine_topk_device

        if q_pad_dev is None or q_pad_dev.shape[1] != self._d_dev:
            q_pad_dev = jax.device_put(self._pad_q_host(xq))  # async; overlaps host probe
        nq_pad = q_pad_dev.shape[0]
        q_scan_dev = q_pad_dev
        if "rot_t" in self._store:  # rabitq rotation / PQ OPQ frame
            q_scan_dev = jnp.dot(q_pad_dev, self._store["rot_t"])

        def _run_scan_device(probes_sub):
            """probes (nq,-) or None (full scan) -> device results."""
            if (
                probes_sub is not None
                and not isinstance(probes_sub, jax.Array)
                and probes_sub.shape[0] != nq_pad
            ):
                probes_sub = np.concatenate(
                    [probes_sub, np.full((nq_pad - probes_sub.shape[0], probes_sub.shape[1]), -1, np.int32)]
                )
            s, p = ivf_scan_search(
                q_scan_dev,
                self._store,
                self._kind,
                probes_sub,
                self._offsets,
                k_scan,
                is_l2,
                keep_sorted=keep_sorted,
                sq_levels=self._sq_levels,
                sq_packed4=self._sq_packed4,
                is_jaccard=internal == M.JACCARD,
                prec=scan_prec,
                return_device=True,
                list_lengths=self._lengths,
                codes_nib=self._codes_nib,
            )
            if two_stage:
                # exact re-rank of the candidates straight off the sorted
                # device storage (positions == row indices there); the sq
                # family re-ranks exact-under-stored-values via SQ8 decode
                if self._kind == "sq":
                    store = RefineStore(
                        "sq8", self._store["codes"],
                        self._store["vmin"], self._store["vdiff"],
                    )
                else:
                    store = RefineStore("raw", self._store["data"])
                d_r, p = refine_topk_device(q_pad_dev, store, p, k_coarse, is_l2)
                return d_r, p, "dist"
            if self._refine_store is not None:
                d_r, p = refine_topk_device(q_pad_dev, self._refine_store, p, k, is_l2)
                return d_r, p, "dist"
            return s, p, "score"

        def _to_host(s_dev, p_dev):
            packed = np.asarray(pack_results(s_dev, p_dev))  # the ONE sync
            s, p = unpack_results(packed)
            return s[:nq].copy(), p[:nq].copy()

        def _native_dists(s: np.ndarray, p: np.ndarray, mode: str) -> np.ndarray:
            if mode == "dist":
                dists = s
            elif self._kind == "rabitq":
                dists = -s if is_l2 else s
            elif is_l2:
                qsq = np.sum(xq.astype(np.float64) ** 2, axis=1).astype(np.float32)
                dists = qsq[:, None] - s
            elif internal == M.JACCARD:
                dists = 1.0 - s
            else:
                dists = s
            return np.where(p >= 0, dists, np.float32(np.inf if is_l2 else -np.inf))

        # probe on device for large batches (this host has few cores —
        # numpy argpartition on nq x nlist dominates); tiny batches avoid
        # the ~30ms d2h sync via the host path
        from ..ops.ivf_scan import coarse_probe_host

        self._ensure_pq_codes_dev(k_scan, nq_pad, scan_prec, keep_sorted is not None)
        nprobe_cur = min(max(1, nprobe), self._nlist)
        mode_tag = (
            "two_stage"
            if two_stage
            else ("refine" if self._refine_store is not None else "plain")
        )
        if nprobe_cur < self._nlist and self._fused_eligible(
            k_scan, nq_pad, scan_prec, keep_sorted is not None,
            internal == M.JACCARD,
        ):
            from ..ops.ivf_scan import unpack_results as _unpack

            k_final = k_coarse if two_stage else k
            fn = self._fused_search_fn(
                nprobe_cur, k_scan, scan_prec, keep_sorted is not None,
                internal == M.JACCARD, mode_tag, k_final,
            )
            rs = self._refine_store
            packed = np.asarray(
                fn(
                    q_pad_dev, np.int32(nq), self._store, keep_sorted,
                    rs.data if rs is not None else None,
                    rs.vmin if rs is not None else None,
                    rs.vdiff if rs is not None else None,
                )
            )
            sh, ph = _unpack(packed)
            best_s, best_p = sh[:nq].copy(), ph[:nq].copy()
            mode = "score" if mode_tag == "plain" else "dist"
        else:
            probes = self._probes_for(
                xq, q_pad_dev, nprobe_cur, is_l2, coarse_probe_host
            )
            s_dev, p_dev, mode = _run_scan_device(probes)
            best_s, best_p = _to_host(s_dev, p_dev)

        # ensure_topk_full: widen nprobe for unfilled queries only (rare path;
        # its extra syncs only happen when the first pass under-filled)
        if ensure_topk_full and nprobe_cur < self._nlist:
            from ..comp import check_current_cancellation

            want = min(best_p.shape[1], n_valid)
            while True:
                check_current_cancellation()  # ivf.cc:962 analog
                unfilled = (best_p >= 0).sum(axis=1) < want
                if not unfilled.any() or nprobe_cur >= self._nlist:
                    break
                active = np.nonzero(unfilled)[0]
                nprobe_cur = min(self._nlist, nprobe_cur * 4)
                if len(active) * self._nlist <= 1 << 20:
                    probes_act = coarse_probe_host(xq[active], self._centroids, nprobe_cur, is_l2)
                else:
                    probes_act = np.asarray(
                        coarse_probe(
                            jax.device_put(self._pad_q_host(xq[active]))[: len(active)],
                            self._store["centroids"], nprobe=nprobe_cur, is_l2=is_l2,
                        )
                    )
                s2, p2, _ = self._rescan_subset(
                    xq[active], probes_act, k_scan, k, k_coarse, keep_sorted,
                    is_l2, internal, scan_prec, two_stage,
                )
                best_s[active], best_p[active] = s2, p2

        dists = _native_dists(best_s, best_p, mode)
        k_cut = min(k, dists.shape[1])
        dists, best_p = dists[:, :k_cut], best_p[:, :k_cut]
        if k_cut < k:  # tiny index: fewer candidates than k
            padw = k - k_cut
            fillv = np.float32(np.inf if is_l2 else -np.inf)
            dists = np.pad(dists, ((0, 0), (0, padw)), constant_values=fillv)
            best_p = np.pad(best_p, ((0, 0), (0, padw)), constant_values=-1)
        ids = np.where(best_p >= 0, self._row_ids[np.clip(best_p, 0, nb - 1)], -1)
        return dists, ids

    def _probes_for(self, xq, q_pad_dev, nprobe_cur, is_l2, coarse_probe_host):
        nq = xq.shape[0]
        if nprobe_cur >= self._nlist:
            # full probe: no coarse assignment needed at all — the scan uses
            # the deterministic full-scan task layout (one sync per search)
            probes = None
        elif nq * self._nlist * max(self._dim, 1) <= 1 << 24:
            # host sgemm only when it is genuinely tiny (1 vCPU host: a
            # 2k x 512 x 1024 probe is ~2 GFLOP = hundreds of ms there)
            probes = coarse_probe_host(xq, self._centroids, nprobe_cur, is_l2)
        else:
            # device probe kept ON device: the task build also runs on device
            # (build_scan_tasks_jax), so NOTHING crosses the tunnel between
            # the query upload and the packed result readback (measured r3:
            # probe d2h + host task build + task h2d was ~200ms of a 308ms
            # nprobe=16 search at 1M x 128). Padded query rows' probes are
            # masked to -1 so the task builder drops them (ADVICE r3: the
            # row ladder can nearly double small batches)
            probes = coarse_probe(
                q_pad_dev, self._store["centroids"], nprobe=nprobe_cur, is_l2=is_l2
            )
            row = jnp.arange(probes.shape[0], dtype=jnp.int32)[:, None]
            probes = jnp.where(row < jnp.int32(nq), probes, -1)
        return probes

    def _rescan_subset(
        self, xq_sub, probes_sub, k_scan, k, k_coarse, keep_sorted,
        is_l2, internal, scan_prec, two_stage,
    ):
        """ensure_topk_full retry for a query subset (extra syncs OK here)."""
        from ..ops.ivf_scan import pack_results, unpack_results
        from ..ops.refine import refine_topk_device

        n_sub = xq_sub.shape[0]
        xq_pad = self._pad_q_host(xq_sub)
        if probes_sub.shape[0] != xq_pad.shape[0]:
            probes_sub = np.concatenate(
                [probes_sub, np.full((xq_pad.shape[0] - probes_sub.shape[0], probes_sub.shape[1]), -1, np.int32)]
            )
        q_pad_dev = jax.device_put(xq_pad)
        q_scan_dev = q_pad_dev
        if "rot_t" in self._store:  # rabitq rotation / PQ OPQ frame
            q_scan_dev = jnp.dot(q_pad_dev, self._store["rot_t"])
        self._ensure_pq_codes_dev(
            k_scan, q_pad_dev.shape[0], scan_prec, keep_sorted is not None
        )
        s, p = ivf_scan_search(
            q_scan_dev, self._store, self._kind, probes_sub, self._offsets,
            k_scan, is_l2, keep_sorted=keep_sorted, sq_levels=self._sq_levels,
            sq_packed4=self._sq_packed4, is_jaccard=internal == M.JACCARD,
            prec=scan_prec, return_device=True, list_lengths=self._lengths,
            codes_nib=self._codes_nib,
        )
        mode = "score"
        if two_stage:
            if self._kind == "sq":
                rs2 = RefineStore("sq8", self._store["codes"],
                                  self._store["vmin"], self._store["vdiff"])
            else:
                rs2 = RefineStore("raw", self._store["data"])
            s, p = refine_topk_device(q_pad_dev, rs2, p, k_coarse, is_l2)
            mode = "dist"
        elif self._refine_store is not None:
            s, p = refine_topk_device(q_pad_dev, self._refine_store, p, k, is_l2)
            mode = "dist"
        packed = np.asarray(pack_results(s, p))
        kk = packed.shape[1] // 2
        s_h = np.ascontiguousarray(packed[:, :kk]).view(np.float32)
        p_h = packed[:, kk:]
        return s_h[:n_sub], p_h[:n_sub], mode

    def _keep_sorted_mask(self, bitset: BitsetView) -> Optional[jax.Array]:
        if bitset.empty_view():
            return None
        keep = bitset.host_mask(self.Count())
        rid = self._row_ids
        keep_sorted = np.zeros(len(rid), dtype=bool)
        valid = rid >= 0
        keep_sorted[valid] = keep[rid[valid]]
        B_slack = 2048
        keep_sorted = np.concatenate([keep_sorted, np.zeros(B_slack, bool)])
        return jax.device_put(keep_sorted)

    # --- full-coverage tail scan (iterator / range-search completion) ---------
    def _decode_sorted_block(self, s: int, e: int) -> np.ndarray:
        """fp32 rows for sorted/padded positions [s, e) — the same values the
        scan kernels score against (quantized kinds decode their codes)."""
        if self._refine_cfg == "raw" and "refine" in self._sorted_payload:
            return np.asarray(self._sorted_payload["refine"][s:e], dtype=np.float32)
        if self._kind == "raw":
            if self._is_binary():
                return D.unpack_bits_host(
                    self._sorted_payload["bits"][s:e], self._dim
                ).astype(np.float32)
            return np.asarray(self._sorted_payload["data"][s:e], dtype=np.float32)
        if self._kind == "pq":
            codes = self._sorted_payload["codes"][s:e]
            books = self._pq.codebooks
            dec = np.concatenate(
                [books[j][codes[:, j]] for j in range(books.shape[0])], axis=1
            )
            if self._opq_rot is not None:  # codes are in the rotated frame
                dec = dec @ self._opq_rot
            lists = np.searchsorted(self._offsets, np.arange(s, e), side="right") - 1
            return dec + self._centroids[np.clip(lists, 0, self._nlist - 1)]
        if self._kind == "sq":
            codec = self._sq
            codes = self._sorted_payload["codes"][s:e]
            if codec.sq_type in ("FP16", "BF16"):
                return codes.astype(np.float32)
            if codec.sq_type == "SQ4":
                lo = (codes & 0xF).astype(np.float32)
                hi = (codes >> 4).astype(np.float32)
                q = np.stack([lo, hi], axis=-1).reshape(codes.shape[0], -1)[:, : codec.dim]
            else:
                q = codes.astype(np.float32)
            return codec.vmin + (q + 0.5) / codec.levels * codec.vdiff
        if self._kind == "rabitq":
            signs01 = D.unpack_bits_host(self._sorted_payload["signs_packed"][s:e], self._dim)
            signs = signs01.astype(np.float32) * 2.0 - 1.0
            r = self._sorted_payload["r_norm"][s:e].astype(np.float32)
            lists = np.searchsorted(self._offsets, np.arange(s, e), side="right") - 1
            cent = self._centroids[np.clip(lists, 0, self._nlist - 1)]
            # rotated residual ~ sign/sqrt(d) * r_norm; un-rotate to data space
            return cent + ((signs / np.sqrt(self._dim)) * r[:, None]) @ self._rbq.rotation
        raise KnowhereException("cannot decode stored rows", Status.internal_error)

    def _larger_is_closer(self) -> bool:
        # native distances: L2/HAMMING squared-L2-like, JACCARD = 1-sim
        # (all smaller-closer); only IP/COSINE surface similarities
        return self._internal_metric() == M.IP

    def _full_sorted(self, xq: np.ndarray, bitset: BitsetView):
        """Covering exact-over-stored-rows scan: (dists, ids) each (nq, n_valid),
        fully sorted best-first in the native distance convention. This is the
        final iterator round / range-search tail — complete by construction
        (reference iterators likewise end up visiting everything,
        index_node.h:672-808)."""
        nb_pad = len(self._row_ids)
        nq = xq.shape[0]
        is_l2 = self._is_l2_like()
        internal = self._internal_metric()
        larger = self._larger_is_closer()
        keep = bitset.host_mask(self.Count()) if not bitset.empty_view() else None
        worst = np.float32(-np.inf if larger else np.inf)
        dists = np.full((nq, nb_pad), worst, np.float32)
        q64 = xq.astype(np.float64)
        for s in range(0, nb_pad, 65536):
            e = min(s + 65536, nb_pad)
            blk = self._decode_sorted_block(s, e).astype(np.float64)
            dots = q64 @ blk.T
            if internal == M.JACCARD:
                qa = q64.sum(1)[:, None]
                ba = blk.sum(1)[None, :]
                d = 1.0 - dots / np.maximum(qa + ba - dots, 1e-12)
            elif is_l2:
                d = (q64**2).sum(1)[:, None] - 2 * dots + (blk**2).sum(1)[None, :]
            else:
                d = dots
            dists[:, s:e] = d.astype(np.float32)
        rid = self._row_ids
        invalid = rid < 0
        if keep is not None:
            invalid = invalid | ~keep[np.clip(rid, 0, None)]
        dists[:, invalid] = worst
        n_valid = int((~invalid).sum())
        order = np.argsort(-dists if larger else dists, axis=1, kind="stable")[:, :n_valid]
        return np.take_along_axis(dists, order, 1), rid[order]

    def _epoch_snapshot(self) -> "IvfIndexNode":
        """Point-in-time view for a lock-free search. Every mutator rebinds
        whole fields under self._lock (epoch swap), so a shallow __dict__ copy
        taken under the same lock is a consistent epoch: the snapshot keeps
        references to the old arrays while Add/merge installs new ones."""
        snap = object.__new__(type(self))
        snap.__dict__.update(self.__dict__)
        return snap

    def Search(self, dataset: DataSet, cfg: Config, bitset: BitsetView) -> "expected[DataSet]":
        with self._lock:
            if self._row_ids is None:
                return expected.Err(Status.empty_index, "index not built")
            metric = normalize_metric(cfg.metric_type)
            if metric != self._metric:
                return expected.Err(
                    Status.invalid_metric_type,
                    f"index built with {self._metric}, searched with {metric}",
                )
            snap = self._epoch_snapshot()
        # the scan runs OUTSIDE the lock on the snapshot epoch: a concurrent
        # CC Add (ivf.cc:605-631) never blocks behind it, and its epoch swap
        # never changes state under it
        xq = snap._prep_queries(dataset)
        k = cfg.k
        keep_sorted = snap._keep_sorted_mask(bitset)
        n_valid = snap.Count() - (bitset.count() if not bitset.empty_view() else 0)
        q_pad_dev = dataset.cached_device(
            f"ivf_qpad:{snap._metric}:{snap.data_type}:{snap._d_dev}",
            lambda: jax.device_put(snap._pad_q_host(xq)),
        )
        dists, ids = snap._search_batch(
            xq,
            k,
            int(cfg.get("nprobe", 8)),
            keep_sorted,
            n_valid,
            bool(cfg.get("ensure_topk_full", True)),
            refine_k=int(cfg.get("refine_k", 1) or 1),
            reorder_k=cfg.get("reorder_k"),
            q_pad_dev=q_pad_dev,
        )
        # pending CC segment: exact scan + merge
        if snap._pending_count:
            dists, ids = snap._merge_with_pending(xq, k, dists, ids, bitset)
        return expected.Ok(GenResultDataSet(dataset.rows, k, ids, dists))

    def _merge_with_pending(self, xq, k, dists, ids, bitset: BitsetView):
        pend = self._prep_rows(np.concatenate(self._pending_rows, axis=0))
        base_count = self._count
        from ..ops.topk import knn_device

        pend_dev = jax.device_put(pend)
        mask = None
        if not bitset.empty_view():
            keep = bitset.host_mask(base_count + pend.shape[0])[base_count:]
            mask = jax.device_put(keep)
        internal = self._internal_metric()
        metric_for_scan = M.L2 if internal == M.HAMMING else internal
        p_d, p_i = knn_device(
            jax.device_put(xq), pend_dev, min(k, pend.shape[0]), metric_for_scan, mask=mask
        )
        p_d, p_i = np.asarray(p_d), np.asarray(p_i, dtype=np.int64)
        p_i = np.where(p_i >= 0, p_i + base_count, -1)
        # host merge of two sorted top-k sets
        larger = self._larger_is_closer()
        cat_d = np.concatenate([dists, p_d], axis=1)
        cat_i = np.concatenate([ids, p_i], axis=1)
        cat_d_for_sort = np.where(cat_i >= 0, cat_d, -np.inf if larger else np.inf)
        order = np.argsort(-cat_d_for_sort if larger else cat_d_for_sort, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(cat_d, order, 1), np.take_along_axis(cat_i, order, 1)

    # --- Range search -------------------------------------------------------------
    def RangeSearch(self, dataset: DataSet, cfg: Config, bitset: BitsetView) -> "expected[DataSet]":
        with self._writer_lock, self._lock:
            if self._row_ids is None:
                return expected.Err(Status.empty_index, "index not built")
            self._merge_pending()
            xq = self._prep_queries(dataset)
            nq = xq.shape[0]
            radius = cfg.get("radius", 0.0)
            range_filter = cfg.get("range_filter", float("inf"))
            two_sided = np.isfinite(range_filter)
            larger = self._larger_is_closer()
            keep_sorted = self._keep_sorted_mask(bitset)
            n_valid = self.Count() - (bitset.count() if not bitset.empty_view() else 0)
            nprobe = min(max(int(cfg.get("nprobe", 8) or 8), 8), self._nlist)
            max_empty = int(cfg.get("max_empty_result_buckets", 2) or 2)

            # expanding-k scan over probed lists until the frontier leaves
            # range. The device rounds stop at DEVICE_K_MAX; queries whose
            # frontier is STILL in range then fall back to a covering host
            # full scan, so a huge radius returns every valid row (reference
            # range search is complete, index_node.h:200-213).
            from ..index_node import DEVICE_K_MAX

            from ..comp import check_current_cancellation

            k_cur = min(256, max(1, n_valid))
            cap = min(n_valid, DEVICE_K_MAX)
            empty_rounds = 0
            while True:
                check_current_cancellation()  # ivf.cc:962 analog
                dists, ids = self._search_batch(
                    xq, k_cur, nprobe, keep_sorted, n_valid, ensure_topk_full=False
                )
                filled = ids[:, -1] >= 0
                # an underfilled frontier means the PROBE SET ran dry, not
                # that the radius ran out — widen nprobe before concluding
                if (~filled).any() and nprobe < self._nlist:
                    nprobe = min(self._nlist, nprobe * 4)
                    continue
                if k_cur >= cap:
                    break
                frontier = dists[:, -1]
                still_in = (frontier > radius) if larger else (frontier < radius)
                still_in &= filled
                if not still_in.any():
                    # ivf_config.h:55-59 max_empty_result_buckets: tolerate a
                    # few expansion rounds that add nothing before stopping
                    empty_rounds += 1
                    if empty_rounds > max_empty:
                        break
                else:
                    empty_rounds = 0
                k_cur = min(cap, k_cur * 4)

            if cap < n_valid:
                # queries whose results are still growing at the device cap:
                # complete them with the covering host full scan
                returned = (ids >= 0).sum(axis=1)
                frontier = dists[:, -1]
                frontier_in = (frontier > radius) if larger else (frontier < radius)
                needy = (returned < n_valid) & (frontier_in | (ids[:, -1] < 0))
                if needy.any():
                    act = np.nonzero(needy)[0]
                    pad = n_valid - dists.shape[1]
                    dists = np.pad(dists, ((0, 0), (0, pad)),
                                   constant_values=np.float32(-np.inf if larger else np.inf))
                    ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
                    for s in range(0, len(act), 64):  # bound host memory
                        sub = act[s : s + 64]
                        d_f, i_f = self._full_sorted(xq[sub], bitset)
                        dists[sub], ids[sub] = d_f, i_f

            lims = np.zeros(nq + 1, dtype=np.int64)
            out_ids, out_d = [], []
            rsk = cfg.get("range_search_k", -1)
            for i in range(nq):
                keep_i = ids[i] >= 0
                if larger:
                    keep_i &= dists[i] > radius
                    if two_sided:
                        keep_i &= dists[i] <= range_filter
                else:
                    keep_i &= dists[i] < radius
                    if two_sided:
                        keep_i &= dists[i] >= range_filter
                sel = np.nonzero(keep_i)[0]
                if rsk is not None and rsk >= 0:
                    sel = sel[:rsk]
                out_ids.append(ids[i, sel])
                out_d.append(dists[i, sel])
                lims[i + 1] = lims[i] + len(sel)
            ids_cat = np.concatenate(out_ids) if out_ids else np.empty(0, np.int64)
            d_cat = np.concatenate(out_d) if out_d else np.empty(0, np.float32)
            return expected.Ok(GenRangeResultDataSet(nq, ids_cat, d_cat, lims))

    # --- Iterator ------------------------------------------------------------------
    def AnnIterator(
        self, dataset: DataSet, cfg: Config, bitset: BitsetView, use_knowhere_search_pool=True
    ) -> "expected[List]":
        with self._writer_lock, self._lock:
            if self._row_ids is None:
                return expected.Err(Status.empty_index, "index not built")
            self._merge_pending()
            xq = self._prep_queries(dataset)
            nq = xq.shape[0]
            keep_sorted = self._keep_sorted_mask(bitset)
            n_valid = self.Count() - (bitset.count() if not bitset.empty_view() else 0)
            nprobe0 = min(max(int(cfg.get("nprobe", 8) or 8), 16), self._nlist)
            larger = self._larger_is_closer()
            from ..index_node import DEVICE_K_MAX, ExpandingIteratorGroup

            k0 = int(min(max(n_valid, 1), 8192))
            nlist = self._nlist

            # Resumable rounds (reference workspace iterator, ivf.cc:1538-1607):
            # widen nprobe x4 and k x4 per round on device, then one covering
            # host full scan once k outgrows DEVICE_K_MAX.
            covered = {"done": False}

            def round_fn(r: int):
                if covered["done"]:
                    return None  # an earlier round already covered everything
                k_r = max(1, min(n_valid, k0 << (2 * r)))
                nprobe_r = min(nlist, nprobe0 << (2 * r))
                if k_r >= n_valid and nprobe_r >= nlist and k_r <= DEVICE_K_MAX:
                    covered["done"] = True  # this round covers everything
                if k_r > DEVICE_K_MAX:
                    covered["done"] = True
                    with self._lock:
                        d_f, i_f = self._full_sorted(xq, bitset)
                    return i_f, d_f
                with self._lock:
                    dists, ids = self._search_batch(
                        xq, k_r, nprobe_r, keep_sorted, n_valid, ensure_topk_full=True
                    )
                return ids, dists

            group = ExpandingIteratorGroup(nq, self.Count(), round_fn)
            return expected.Ok(
                [group.make_iterator(i, larger_is_closer=larger) for i in range(nq)]
            )

    # --- vectors ---------------------------------------------------------------------
    def GetVectorByIds(self, dataset: DataSet) -> "expected[DataSet]":
        if not self.HasRawData(self._metric):
            return expected.Err(Status.not_implemented, "index does not store raw data")
        with self._lock:
            if self._row_ids is None:
                return expected.Err(Status.empty_index, "index not built")
            ids = np.asarray(dataset.ids, dtype=np.int64)
            if ids.min(initial=0) < 0 or ids.max(initial=-1) >= self.Count():
                return expected.Err(Status.invalid_args, "id out of range")
            if self._is_binary():
                bits = self._sorted_payload["bits"]
                out = bits[self._pos_of_row[ids]]
            elif "refine" in self._sorted_payload and self._refine_cfg == "raw":
                out = self._sorted_payload["refine"][self._pos_of_row[ids]]
            else:
                data = self._sorted_payload["data"]
                out = data[self._pos_of_row[ids]]
                if self._metric == M.COSINE and self._norms_raw is not None:
                    out = out * self._norms_raw[ids][:, None]
                    out = out.astype(_np_dtype_of(self.data_type))
            return expected.Ok(GenTensorDataSet(out, len(ids), self._dim))

    def CalcDistByIDs(self, query_ds, bitset, ids, rows) -> "expected[np.ndarray]":
        if "data" not in self._sorted_payload and "refine" not in self._sorted_payload:
            return expected.Err(Status.not_implemented, "no raw data for CalcDistByIDs")
        xq = self._prep_queries(query_ds)
        key = "data" if "data" in self._sorted_payload else "refine"
        sub = self._sorted_payload[key][self._pos_of_row[np.asarray(ids)]]
        internal = self._internal_metric()
        q_dev = jax.device_put(xq)
        s_dev = jax.device_put(np.asarray(sub, dtype=np.float32))
        dmat = np.asarray(D.pairwise_distance(internal, q_dev, s_dev, D.base_aux(internal, s_dev)))
        return expected.Ok(dmat)

    def HasRawData(self, metric_type: str = "L2") -> bool:
        # reference CommonHasRawData (ivf.cc:177-199): FLAT/FLAT_CC/BIN true,
        # PQ/SQ/RaBitQ false, SCANN = with_raw_data.
        if self.VARIANT in ("flat", "flat_cc", "bin"):
            return True
        if self.VARIANT == "scann":
            return self._refine_cfg == "raw"
        if self.VARIANT == "sq_cc":
            return False
        return False

    def GetIndexMeta(self, cfg: Config) -> "expected[DataSet]":
        import json as _json

        if self._offsets is None:
            return expected.Err(Status.empty_index, "index not built")
        meta = {
            "index_type": self.Type(),
            "metric_type": self._metric,
            "nlist": self._nlist,
            "dim": self._dim,
            "count": self.Count(),
            "list_sizes": (self._lengths if self._lengths is not None else np.diff(self._offsets)).tolist(),
        }
        ds = DataSet()
        ds.set("json_info", _json.dumps(meta))
        return expected.Ok(ds)

    def GetFederVisit(self, dataset: DataSet, cfg: Config) -> "expected[DataSet]":
        """trace_visit replay: per-query probed lists + their sizes
        (reference include/knowhere/feder/IVFFlat.h FederResult)."""
        import json as _json

        from ..ops.ivf_scan import coarse_probe_host

        if self._offsets is None:
            return expected.Err(Status.empty_index, "index not built")
        xq = self._prep_queries(dataset)
        nprobe = int(cfg.get("nprobe", 8) or 8)
        probes = coarse_probe_host(xq, self._centroids, nprobe, self._is_l2_like())
        lens = self._lengths if self._lengths is not None else np.diff(self._offsets)
        traces = [
            [
                {"list_id": int(l), "size": int(lens[l])}
                for l in row.tolist()
                if l >= 0
            ]
            for row in probes
        ]
        ds = DataSet()
        ds.set("json_id_set", _json.dumps(traces))
        return expected.Ok(ds)

    # --- serialization ------------------------------------------------------------------
    def Serialize(self, binset: BinarySet) -> Status:
        with self._writer_lock, self._lock:
            if self._row_ids is None:
                return Status.empty_index
            if self._pending_count:
                self._merge_pending()
            arrays = {
                "centroids": self._centroids,
                "row_ids": self._row_ids,
                "offsets": self._offsets,
                "lengths": self._lengths,
            }
            for k_, v in self._sorted_payload.items():
                arrays["payload_" + k_] = np.asarray(v)
            if self._norms_raw is not None:
                arrays["norms_raw"] = self._norms_raw
            meta = {
                "variant": self.VARIANT,
                "metric": self._metric,
                "dim": self._dim,
                "nlist": self._nlist,
                "data_type": self.data_type,
                "refine_cfg": self._refine_cfg,
            }
            if self._pq is not None:
                arrays["pq_codebooks"] = self._pq.codebooks
                meta["pq_nbits"] = self._pq.nbits
                if self._opq_rot is not None:
                    arrays["opq_rotation"] = self._opq_rot
            if self._sq is not None:
                meta["sq_type"] = self._sq.sq_type
                if self._sq.vmin is not None:
                    arrays["sq_vmin"] = self._sq.vmin
                    arrays["sq_vdiff"] = self._sq.vdiff
            if self._rbq is not None:
                arrays["rbq_rotation"] = self._rbq.rotation
            blob = write_sections(arrays, meta=meta)
            binset.Append(self.Type(), blob)
            return Status.success

    def Deserialize(self, binset: BinarySet, cfg: Config) -> Status:
        binary = binset.GetByName(self.Type())
        if binary is None:
            return Status.invalid_binary_set
        arrays, meta = read_sections(binary.data)
        if meta.get("variant") != self.VARIANT:
            return Status.invalid_serialized_index_type
        with self._lock:
            self._metric = meta["metric"]
            self._dim = int(meta["dim"])
            self._nlist = int(meta["nlist"])
            self.data_type = meta.get("data_type", "fp32")
            self._refine_cfg = meta.get("refine_cfg")
            self._centroids = np.asarray(arrays["centroids"])
            self._row_ids = np.asarray(arrays["row_ids"])
            self._offsets = np.asarray(arrays["offsets"])
            valid = self._row_ids >= 0
            self._count = int(valid.sum())
            self._pos_of_row = np.empty(self._count, dtype=np.int64)
            self._pos_of_row[self._row_ids[valid]] = np.nonzero(valid)[0]
            if "lengths" in arrays:
                self._lengths = np.asarray(arrays["lengths"], dtype=np.int64)
            else:  # pre-alignment blob: storage was compact
                csum = np.concatenate([[0], np.cumsum(valid)])
                self._lengths = (csum[self._offsets[1:]] - csum[self._offsets[:-1]]).astype(np.int64)
            self._norms_raw = np.asarray(arrays["norms_raw"]) if "norms_raw" in arrays else None
            self._sorted_payload = {
                k_[len("payload_") :]: np.asarray(v)
                for k_, v in arrays.items()
                if k_.startswith("payload_")
            }
            if "pq_codebooks" in arrays:
                books = np.asarray(arrays["pq_codebooks"])
                self._pq = Q.PQCodec(books, books.shape[0], int(meta["pq_nbits"]))
                self._opq_rot = (
                    np.asarray(arrays["opq_rotation"], dtype=np.float32)
                    if "opq_rotation" in arrays
                    else None
                )
            if "sq_type" in meta:
                self._sq = Q.SQCodec(
                    meta["sq_type"],
                    np.asarray(arrays["sq_vmin"]) if "sq_vmin" in arrays else None,
                    np.asarray(arrays["sq_vdiff"]) if "sq_vdiff" in arrays else None,
                    dim=self._dim,
                )
            if "rbq_rotation" in arrays:
                self._rbq = Q.RaBitQCodec(np.asarray(arrays["rbq_rotation"]), self._dim)
            self._trained = True
            self._upload()
        return Status.success

    # --- introspection ---------------------------------------------------------------------
    def Dim(self) -> int:
        return self._dim

    def Size(self) -> int:
        return sum(np.asarray(v).nbytes for v in self._sorted_payload.values()) + (
            self._centroids.nbytes if self._centroids is not None else 0
        )

    def Count(self) -> int:
        base = 0 if self._row_ids is None else self._count
        return base + self._pending_count

    def Type(self) -> str:
        return self.index_type

    @classmethod
    def CreateConfig(cls) -> Config:
        return _CONFIGS[cls.VARIANT]()


# Concrete variants -----------------------------------------------------------


class IvfFlatNode(IvfIndexNode):
    VARIANT = "flat"


class IvfFlatCcNode(IvfIndexNode):
    VARIANT = "flat_cc"


class IvfSqNode(IvfIndexNode):
    VARIANT = "sq"


class IvfSqCcNode(IvfIndexNode):
    VARIANT = "sq_cc"


class IvfPqNode(IvfIndexNode):
    VARIANT = "pq"


class ScannNode(IvfIndexNode):
    VARIANT = "scann"


class IvfRaBitQNode(IvfIndexNode):
    VARIANT = "rabitq"


class IvfRaBitQFastScanNode(IvfIndexNode):
    VARIANT = "rabitq_fastscan"


class BinIvfFlatNode(IvfIndexNode):
    VARIANT = "bin"


_DENSE_TYPES = ("fp32", "fp16", "bf16", "int8")
_F = feature

register_index(
    IndexEnum.INDEX_FAISS_IVFFLAT, _DENSE_TYPES,
    _F.ALL_DENSE_TYPE | _F.KNN | _F.MMAP | _F.EMB_LIST,
)(IvfFlatNode)
register_index(
    IndexEnum.INDEX_FAISS_IVFFLAT_CC, _DENSE_TYPES, _F.ALL_DENSE_TYPE | _F.KNN,
)(IvfFlatCcNode)
register_index(
    IndexEnum.INDEX_FAISS_IVFSQ8, _DENSE_TYPES, _F.ALL_DENSE_TYPE | _F.KNN | _F.MMAP,
)(IvfSqNode)
register_index(
    IndexEnum.INDEX_FAISS_IVFSQ_CC, _DENSE_TYPES, _F.ALL_DENSE_TYPE | _F.KNN,
)(IvfSqCcNode)
register_index(
    IndexEnum.INDEX_FAISS_IVFPQ, _DENSE_TYPES, _F.ALL_DENSE_TYPE | _F.KNN | _F.MMAP,
)(IvfPqNode)
register_index(
    IndexEnum.INDEX_FAISS_SCANN, _DENSE_TYPES, _F.ALL_DENSE_TYPE | _F.KNN | _F.MMAP,
)(ScannNode)
register_index(
    IndexEnum.INDEX_FAISS_IVFRABITQ, _DENSE_TYPES, _F.ALL_DENSE_TYPE | _F.KNN | _F.MMAP,
)(IvfRaBitQNode)
register_index(
    IndexEnum.INDEX_FAISS_IVFRABITQ_FASTSCAN, _DENSE_TYPES, _F.ALL_DENSE_TYPE | _F.KNN,
)(IvfRaBitQFastScanNode)
register_index(
    IndexEnum.INDEX_FAISS_BIN_IVFFLAT, ("bin1",), _F.BINARY | _F.KNN | _F.MMAP,
)(BinIvfFlatNode)
# legacy alias (reference ivf.cc:1926 registers IVFBIN alongside BIN_IVF_FLAT)
register_index("IVFBIN", ("bin1",), _F.BINARY | _F.KNN | _F.MMAP)(BinIvfFlatNode)

# GPU_CUVS_* / GPU_* / TPU_* IVF names live in models/cagra.py with the full
# cuVS config surface. Only the legacy faiss-GPU names stay plain aliases
# (reference src/index/gpu/ flat_gpu/ivf_gpu keep the plain IVF configs).
for _alias, _node in (
    (IndexEnum.INDEX_FAISS_GPU_IVFFLAT, IvfFlatNode),
    (IndexEnum.INDEX_FAISS_GPU_IVFPQ, IvfPqNode),
    (IndexEnum.INDEX_FAISS_GPU_IVFSQ8, IvfSqNode),
):
    register_index(_alias, _DENSE_TYPES, _F.ALL_DENSE_TYPE | _F.KNN | _F.GPU)(_node)
