"""HNSW family: HNSW, HNSW_SQ, HNSW_PQ, HNSW_PRQ (+ TPU_CAGRA aliases).

Behavioral parity target: reference src/index/hnsw/faiss_hnsw.cc (3289 LoC)
+ faiss_hnsw_config.h — HNSW/SQ/PQ/PRQ over fp32/fp16/bf16/int8/bin1
(faiss_hnsw.cc:3255-3287), optional refine store with refine_k, bitset
filtering with brute-force fallback when the filter is too dense
(HNSWIndexNodeWithFallback, faiss_hnsw.cc:2191; IndexConditionalWrapper),
iterators (faiss_hnsw.cc:843-940), range search, mmap deserialize.

TPU design (ops/graph.py): the level hierarchy + sequential inserts become a
flat fixed-degree diversified graph (same neighbor-selection heuristic,
RobustPrune/select_neighbors_heuristic) built from a batched kNN graph;
search is batched best-first beam search under one jit'd while_loop with ef
beam width. Equal quality contract at equal (M, ef) budgets; build is MXU
batched instead of lock-striped inserts.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..binaryset import BinarySet
from ..bitset import BitsetView
from ..config import BaseConfig, Config, Entry, Stage
from ..dataset import DataSet, GenResultDataSet, GenTensorDataSet
from ..factory import register_index
from ..feature import feature
from ..index_param import IndexEnum, metric as M, normalize_metric
from ..index_node import BatchedDistanceIterator, IndexNode
from ..io.serialize import read_sections, write_sections
from ..ops import distances as D
from ..ops import quant as Q
from ..ops.graph import beam_search, build_graph, pick_entry_points
from ..ops.refine import RefineStore, refine_topk
from ..ops.topk import knn_device
from ..status import KnowhereException, Status, expected

# Bitset density beyond which graph search degrades and the reference falls
# back to brute force (IndexConditionalWrapper behavior).
BRUTE_FORCE_FALLBACK_RATIO = 0.9

# beam-search gather compaction (ops/graph.beam_search compact_ratio): score
# only this fraction of the W*deg neighbor lanes per step, fresh-first in
# parent-rank order. MEASURED NEGATIVE on v5e (SIFT-like 1M, ef=32/W=2:
# 6417 QPS@1.0 vs 5132@0.75 vs 3851@0.5, recall flat then dipping) — the
# per-step argsort outweighs the saved gather width, i.e. the walk is NOT
# purely gather-bound at the operating point. Default off; kept env-gated
# for re-evaluation at larger W/deg.
import os as _os

GRAPH_COMPACT_RATIO = float(_os.environ.get("KNOWHERE_GRAPH_COMPACT", "1.0"))


class BaseHnswConfig(BaseConfig):
    """reference src/index/hnsw/base_hnsw_config.h:28-58 + faiss additions."""

    M = Entry(int, default=30, range=(2, 2048), stages=[Stage.TRAIN])
    efConstruction = Entry(int, default=360, range=(1, None), stages=[Stage.TRAIN])
    ef = Entry(int, range=(1, None), stages=[Stage.SEARCH, Stage.ITERATOR, Stage.RANGE_SEARCH], allow_empty=True)
    seed_ef = Entry(int, range=(1, None), stages=[Stage.ITERATOR], allow_empty=True)
    overview_levels = Entry(int, default=3, range=(1, 5), stages=[Stage.FEDER])
    disable_fallback_brute_force = Entry(bool, default=False, stages=[Stage.SEARCH])
    refine = Entry(bool, default=False, stages=[Stage.TRAIN])
    refine_type = Entry(str, stages=[Stage.TRAIN], allow_empty=True)
    refine_k = Entry(int, default=1, range=(1, None), stages=[Stage.SEARCH])


class HnswConfig(BaseHnswConfig):
    pass


class HnswSqConfig(BaseHnswConfig):
    sq_type = Entry(str, default="SQ8", stages=[Stage.TRAIN])


class HnswPqConfig(BaseHnswConfig):
    m = Entry(int, default=32, range=(1, 65536), stages=[Stage.TRAIN])
    nbits = Entry(int, default=8, range=(1, 16), stages=[Stage.TRAIN])


class HnswPrqConfig(BaseHnswConfig):
    m = Entry(int, default=2, range=(1, 65536), stages=[Stage.TRAIN])
    nrq = Entry(int, default=2, range=(1, 16), stages=[Stage.TRAIN])
    nbits = Entry(int, default=8, range=(1, 16), stages=[Stage.TRAIN])


_CONFIGS = {
    "flat": HnswConfig,
    "sq": HnswSqConfig,
    "pq": HnswPqConfig,
    "prq": HnswPrqConfig,
    "lvq": HnswSqConfig,  # SVS LVQ store (models/svs.py overrides CreateConfig)
}


class HnswIndexNode(IndexNode):
    VARIANT = "flat"

    def __init__(self, version: int, object=None):  # noqa: A002
        super().__init__(version, object)
        self.index_type = IndexEnum.INDEX_HNSW
        self.data_type = "fp32"
        self._lock = threading.RLock()
        self._metric = M.L2
        self._dim = 0
        self._M = 30
        self._graph: Optional[np.ndarray] = None
        self._entry: Optional[np.ndarray] = None
        self._entry_cents: Optional[np.ndarray] = None  # kmeans routing centroids
        self._entry_dev = None
        self._entry_cents_dev = None
        self._xb_host: Optional[np.ndarray] = None  # compute rows (host)
        self._raw_host: Optional[np.ndarray] = None  # original rows for GetVectorByIds
        self._payload: Dict[str, np.ndarray] = {}
        self._pq: Optional[Q.PQCodec] = None
        self._prq_books: Optional[np.ndarray] = None
        self._sq: Optional[Q.SQCodec] = None
        self._refine_cfg: Optional[str] = None
        self._store: Optional[Dict[str, jax.Array]] = None
        self._graph_dev = None
        self._refine_store: Optional[RefineStore] = None
        self._kind = "raw"
        self._pending: List[np.ndarray] = []
        self._inline = None  # InlineGraphStore fast path (ops/graph_inline.py)
        # SVS LeanVec (svs_vamana.cc:522-526): PCA basis for the reduced-dim
        # walk store; None for every other variant
        self._lv_proj: Optional[np.ndarray] = None  # (d, r)
        self._lv_mean: Optional[np.ndarray] = None  # (d,)

    # --- helpers ------------------------------------------------------------
    def _is_binary(self) -> bool:
        return self.data_type == "bin1"

    def _internal_metric(self) -> str:
        return M.IP if self._metric == M.COSINE else self._metric

    def _is_l2_like(self) -> bool:
        return self._internal_metric() in (M.L2, M.HAMMING)

    def _larger_is_closer(self) -> bool:
        # native distances: L2/HAMMING squared-L2-like and JACCARD = 1-sim are
        # smaller-closer; only IP/COSINE surface similarities
        return self._internal_metric() == M.IP

    def _prep_rows(self, x: np.ndarray) -> np.ndarray:
        if self._is_binary():
            return D.unpack_bits_host(np.asarray(x).view(np.uint8), self._dim).astype(np.float32)
        x = np.asarray(x).astype(np.float32)
        if self._metric == M.COSINE:
            n = np.linalg.norm(x, axis=1, keepdims=True)
            n[n == 0] = 1.0
            x = x / n
        return x

    # --- build --------------------------------------------------------------
    def Train(self, dataset: DataSet, cfg: Config) -> Status:
        self._metric = normalize_metric(cfg.metric_type)
        ok_metrics = (M.HAMMING, M.JACCARD) if self._is_binary() else (M.L2, M.IP, M.COSINE)
        if self._metric not in ok_metrics:
            raise KnowhereException(
                f"metric {self._metric} not supported by {self.Type()}", Status.invalid_metric_type
            )
        self._dim = dataset.dim
        self._M = int(cfg.M)
        self._efc = int(cfg.efConstruction)
        self._refine_cfg = self._refine_kind(cfg)
        self._train_cfg = cfg
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

    def Add(self, dataset: DataSet, cfg: Config) -> Status:
        x_in = np.asarray(dataset.tensor)
        with self._lock:
            if self._graph is not None:
                # incremental add: stage rows; graph is rebuilt lazily before
                # the next search (batched rebuild replaces per-insert updates)
                self._pending.append(x_in)
                return Status.success
            self._build_all(x_in)
        return Status.success

    def _build_all(self, x_in: np.ndarray) -> None:
        x = self._prep_rows(x_in)
        nb = x.shape[0]
        # degree: HNSW level-0 uses 2*M links (hnswlib maxM0_ = 2*M)
        deg = min(max(2 * self._M, 4), max(nb - 1, 1))
        # intermediate candidate pool scales with efConstruction (quality knob)
        inter = min(max(deg, min(self._efc // 4, 128)), max(nb - 1, 1))
        # ONE k-means shared by the kNN-graph accelerator and entry points
        cents = assign = None
        if nb > 65536 or (_os.environ.get("KNOWHERE_GRAPH_INLINE") == "1" and nb >= 256):
            from ..ops.kmeans import kmeans as _kmeans

            # kmeans subsamples internally (max_points_per_centroid=256,
            # faiss parity) and assigns the full corpus once
            # pow2 ladder keeps kernel shapes reusable across corpus sizes
            nlist = 1 << int(round(np.log2(max(64, int(np.sqrt(nb))))))
            cents, assign = _kmeans(x, nlist, n_iters=8)
        # ONE resident corpus upload shared by prune, entry mapping, and (for
        # the flat variant) the search store — each 512MB h2d costs ~5-30s
        x_dev_shared = jax.device_put(x.astype(np.float32))
        self._graph = build_graph(
            x, deg, self._internal_metric(), intermediate_deg=inter,
            centroids=cents, assign=assign, x_dev=x_dev_shared,
        )
        # entry points: at scale, keep the PER-CENTROID map (centroid i ->
        # its nearest resident node) plus the centroids themselves, so search
        # can route each query to its own top-n_seed entries with one matmul
        # (the TPU-native replacement for the HNSW hierarchy descent). Small
        # corpora keep the legacy global entry set.
        if cents is not None:
            from ..ops import topk as T

            aux = D.base_aux("L2", x_dev_shared)
            ids, _ = T.knn_search(cents, x_dev_shared, 1, "L2", aux=aux)
            self._entry = ids.reshape(-1).astype(np.int32)
            self._entry_cents = cents.astype(np.float32)
        else:
            n_entry = int(min(max(64, nb // 500), 1024, nb))
            self._entry = pick_entry_points(x, n_entry=n_entry, base_dev=x_dev_shared)
            self._entry_cents = None
        if not self._is_binary():
            self._raw_host = np.asarray(x_in)
        # payload per variant
        if self.VARIANT == "flat":
            # Native typed storage (reference distances_typed.cpp): fp16/bf16/
            # int8 corpora keep their width — non-cosine payload IS the raw
            # rows (no fp32 copy); cosine keeps the normalized copy in bf16.
            # The walk's decode casts gathered rows (ops/graph.py:495), so
            # persistent HBM stays native width.
            typed = self.data_type in ("fp16", "bf16", "int8")
            if typed and self._metric != M.COSINE:
                self._payload = {"data": self._raw_host}
            elif typed:
                import ml_dtypes

                self._payload = {"data": x.astype(ml_dtypes.bfloat16)}
            else:
                self._payload = {"data": x}
            if not self._is_binary() and not typed:
                self._data_dev_prebuilt = x_dev_shared
            if self._is_binary():
                self._payload["bits_raw"] = np.asarray(x_in)
        elif self.VARIANT == "sq":
            # real per-width stores (hnsw_config.h sq_type): SQ4 packs two
            # codes/byte, SQ6 uses a 64-level byte grid, FP16/BF16 keep the
            # cast rows as a raw-kind store (the walk decodes each width:
            # ops/graph.py _decode_core kinds 'sq'/'sq6'/'sq4')
            self._sq = Q.sq_train(x, getattr(self._train_cfg, "sq_type", "SQ8") or "SQ8")
            if self._sq.sq_type in ("FP16", "BF16"):
                import ml_dtypes

                self._payload = {"data": x.astype(ml_dtypes.bfloat16)}
            else:
                self._payload = {"codes": Q.sq_encode(self._sq, x)}
        elif self.VARIANT == "lvq":
            # SVS LVQ semantics (svs_vamana.cc storage kinds): per-vector grid
            # over the mean-centred residual; 1 byte/dim + 2 f32/vector
            lvq = Q.lvq_train(x)
            codes, off, scale = Q.lvq_encode(lvq, x)
            self._payload = {
                "codes": codes,
                "lvq_mean": lvq.mean,
                "lvq_off": off,
                "lvq_scale": scale,
            }
        elif self.VARIANT == "leanvec":
            # SVS LeanVec as the reference means it (svs_vamana.cc:522-526):
            # the WALK runs in a PCA-reduced store at svs_leanvec_dim while
            # the final rerank scores the candidates at full dim (refine
            # payload below). The graph itself is built full-dim above —
            # better neighborhoods at zero serve-time cost.
            r = int(getattr(self._train_cfg, "svs_leanvec_dim", 0) or 0)
            if r <= 0 or r >= self._dim:
                r = max(1, self._dim // 2)  # reference default: dims/2
            mean = x.mean(0).astype(np.float32)
            xc = x - mean
            cov = (xc.T.astype(np.float64) @ xc.astype(np.float64)) / max(1, nb)
            _w, v = np.linalg.eigh(cov)
            self._lv_proj = v[:, ::-1][:, :r].astype(np.float32)  # (d, r)
            self._lv_mean = mean
            self._payload = {"data_lv": (xc @ self._lv_proj).astype(np.float32)}
        elif self.VARIANT == "pq":
            m = int(getattr(self._train_cfg, "m", 32) or 32)
            if self._dim % m != 0:
                m = self._fix_m(m)
            self._pq = Q.pq_train(x, m, int(getattr(self._train_cfg, "nbits", 8) or 8))
            self._payload = {"codes": Q.pq_encode(self._pq, x)}
        elif self.VARIANT == "prq":
            m = int(getattr(self._train_cfg, "m", 2) or 2)
            if self._dim % m != 0:
                m = self._fix_m(m)
            nrq = int(getattr(self._train_cfg, "nrq", 2) or 2)
            nbits = int(getattr(self._train_cfg, "nbits", 8) or 8)
            books, codes = self._train_prq(x, m, nrq, nbits)
            self._prq_books = books
            self._payload = {"codes": codes}
        if self._refine_cfg or self.VARIANT in ("sq", "pq", "prq", "lvq", "leanvec"):
            # quantized variants keep a refine store (default raw) so refine_k
            # works; HNSW(flat) only when requested
            kind = self._refine_cfg or "raw"
            if self.VARIANT == "flat" and not self._refine_cfg:
                pass
            else:
                self._add_refine_payload(x, kind)
        self._upload()

    def _fix_m(self, m: int) -> int:
        while m > 1 and self._dim % m != 0:
            m -= 1
        return max(m, 1)

    def _train_prq(self, x: np.ndarray, m: int, nrq: int, nbits: int):
        """Product residual quantizer: per dim-group, chain of nrq PQ stages."""
        nb, d = x.shape
        books = []
        codes = np.empty((nb, nrq * m), dtype=np.uint8)
        resid = x.copy()
        for s in range(nrq):
            pq = Q.pq_train(resid, m, nbits, seed=1000 + s)
            c = Q.pq_encode(pq, resid)
            codes[:, s * m : (s + 1) * m] = c
            dec = np.asarray(Q.pq_decode_dev(jax.device_put(pq.codebooks), jax.device_put(c)))
            resid = resid - dec
            books.append(pq.codebooks)
        return np.stack(books), codes

    def _add_refine_payload(self, x: np.ndarray, kind: str) -> None:
        self._refine_cfg = kind
        if kind == "raw":
            self._payload["refine"] = x.astype(np.float32)
        elif kind == "sq8":
            sq = Q.sq_train(x, "SQ8")
            self._payload["refine"] = Q.sq_encode(sq, x)
            self._payload["refine_vmin"] = sq.vmin
            self._payload["refine_vdiff"] = sq.vdiff
        elif kind == "fp16":
            self._payload["refine"] = x.astype(np.float16)
        elif kind == "bf16":
            import ml_dtypes

            self._payload["refine"] = x.astype(ml_dtypes.bfloat16)

    def _upload(self) -> None:
        self._graph_dev = jax.device_put(self._graph)
        self._entry_dev = jax.device_put(self._entry)
        self._entry_cents_dev = (
            jax.device_put(self._entry_cents) if self._entry_cents is not None else None
        )
        if self.VARIANT == "flat":
            pre = getattr(self, "_data_dev_prebuilt", None)
            if pre is not None and pre.shape == self._payload["data"].shape:
                self._store = {"data": pre}  # corpus already resident (build)
            else:
                data = self._payload["data"]
                if data.dtype == np.float16:
                    # bf16 device width (fp16 is not an MXU input type);
                    # int8/bf16 upload as-is — decode casts per gather
                    import ml_dtypes

                    data = data.astype(ml_dtypes.bfloat16)
                self._store = {"data": jax.device_put(data)}
            self._data_dev_prebuilt = None
            self._kind = "raw"
        elif self.VARIANT == "sq":
            if "data" in self._payload:  # FP16/BF16: raw bf16 store
                self._store = {"data": jax.device_put(self._payload["data"])}
                self._kind = "raw"
            else:
                self._store = {
                    "codes": jax.device_put(self._payload["codes"]),
                    "vmin": jax.device_put(self._sq.vmin),
                    "vdiff": jax.device_put(self._sq.vdiff),
                }
                self._kind = {"SQ8": "sq", "SQ6": "sq6", "SQ4": "sq4"}[self._sq.sq_type]
        elif self.VARIANT == "lvq":
            self._store = {
                "codes": jax.device_put(self._payload["codes"]),
                "off": jax.device_put(self._payload["lvq_off"]),
                "scale": jax.device_put(self._payload["lvq_scale"]),
                "mean": jax.device_put(self._payload["lvq_mean"]),
            }
            self._kind = "lvq"
        elif self.VARIANT == "leanvec":
            # reduced-dim raw walk store; queries and routing centroids are
            # projected into the same frame at search time
            self._store = {"data": jax.device_put(self._payload["data_lv"])}
            self._kind = "raw"
            if self._entry_cents is not None:
                self._entry_cents_dev = jax.device_put(
                    (self._entry_cents - self._lv_mean[None, :]) @ self._lv_proj
                )
        elif self.VARIANT == "pq":
            self._store = {
                "codes": jax.device_put(self._payload["codes"]),
                "codebooks": jax.device_put(self._pq.codebooks),
            }
            self._kind = "pq"
        elif self.VARIANT == "prq":
            self._store = {
                "codes": jax.device_put(self._payload["codes"]),
                "codebooks": jax.device_put(self._prq_books),
            }
            self._kind = "prq"
        if "refine" in self._payload:
            if self._refine_cfg == "sq8":
                self._refine_store = RefineStore(
                    "sq8",
                    jax.device_put(self._payload["refine"]),
                    jax.device_put(self._payload["refine_vmin"]),
                    jax.device_put(self._payload["refine_vdiff"]),
                )
            else:
                self._refine_store = RefineStore("raw", jax.device_put(self._payload["refine"]))
        # demote resident host copies to disk-backed memmaps: the device
        # store is the search structure; host arrays only feed Serialize /
        # GetVectorByIds / incremental re-merges (equal-memory north star)
        from ..utils.spill import spill_array, spill_dict

        raw = self._raw_host
        if raw is not None:
            raw_sp = spill_array(raw)
            if self._payload.get("data") is raw:
                self._payload["data"] = raw_sp  # keep the alias identity
            self._raw_host = raw_sp
        spill_dict(self._payload)
        self._refresh_inline()

    def _refresh_inline(self) -> None:
        """(Re)build the inline-neighborhood fast path (ops/graph_inline.py)
        when eligible: wide-row gathers + bf16 SQ8 walk + exact rerank gave
        5.2x search QPS at equal recall vs the narrow-gather walk (measured
        v5e, 1M x 128, M=16: 6.9k -> 36k QPS at recall@10=0.976).

        Gating: raw/SQ8 dense stores with d % 4 == 0, routed entries present
        (large corpora), table fits the HBM budget. KNOWHERE_GRAPH_INLINE=0
        disables; =1 forces (ignores size floor). The table is derived data —
        rebuilt after build/load/insert, never serialized."""
        import os

        if self._inline is not None:
            self._inline.delete()
            self._inline = None
        mode = os.environ.get("KNOWHERE_GRAPH_INLINE", "auto")
        if mode == "0" or self._graph is None or self._is_binary():
            return
        if self.VARIANT == "leanvec":
            return  # reduced-dim walk + full-dim rerank takes the general path
        if self._kind not in ("raw", "sq", "pq", "prq", "lvq") or self._entry_cents is None:
            return
        if self._internal_metric() not in (M.L2, M.IP):
            return
        nb, deg = self._graph.shape
        if self._dim % 4 != 0 or nb >= (1 << 30):
            return
        from ..ops.graph_inline import inline_row_words, make_inline_store

        bits = int(os.environ.get("KNOWHERE_INLINE_BITS", "4"))
        bits = bits if bits in (4, 8) else 8
        if self._dim % (32 // bits) != 0:
            bits = 8  # make_inline_store falls back too; budget must match
        table_bytes = nb * inline_row_words(deg, self._dim, bits) * 4
        budget = float(os.environ.get("KNOWHERE_INLINE_BUDGET_GB", "6")) * (1 << 30)
        if mode != "1" and (table_bytes > budget or nb < 100_000):
            return
        try:
            self._inline = make_inline_store(
                self._graph, self._kind, self._store,
                x_host=self._payload.get("data") if self._kind == "raw" else None,
                bits=bits,
            )
        except Exception:  # any backend limitation -> stay on the general path
            self._inline = None

    def _flush_pending(self) -> None:
        if not self._pending:
            return
        new_rows = np.concatenate(self._pending, axis=0)
        self._pending = []
        nb_old = 0 if self._graph is None else self._graph.shape[0]
        if (
            self._graph is not None
            and not self._is_binary()
            and nb_old >= 1024
            and new_rows.shape[0] <= nb_old // 5
        ):
            # small additions insert incrementally; big ones rebuild (the
            # batched build is fast enough that >20% growth favors a rebuild
            # whose every node sees the full corpus)
            self._insert_batch(new_rows)
            return
        parts = []
        if self._raw_host is not None:
            parts.append(self._raw_host)
        elif self._is_binary():
            parts.append(self._payload["bits_raw"])
        parts.append(new_rows)
        merged = np.concatenate(parts, axis=0)
        self._graph = None
        self._build_all(merged)

    def _insert_batch(self, x_new_in: np.ndarray) -> None:
        """Incremental insert without a rebuild — the batched analog of
        hnswlib's per-insert path (thirdparty/hnswlib/hnswlib/hnswalg.h
        addPoint: searchBaseLayer for candidates, getNeighborsByHeuristic2
        prune, mutuallyConnectNewElement reverse-edge repair):

        1. ONE batched beam search over the existing graph finds every new
           node's candidate pool (all inserts run as a device batch).
        2. An intra-batch kNN adds new<->new candidates (sequential inserts
           see earlier ones; a batch must make those pairs explicit).
        3. prune_candidates_ids (RobustPrune, sorts+dedupes in-function)
           picks each new node's <=deg neighbors.
        4. Reverse edges: touched nodes get their adjacency re-pruned over
           {old neighbors} + {incoming new nodes}.
        """
        from ..ops.graph import _approx_knn_graph, beam_search, prune_candidates_ids
        from ..ops.distances import matmul_precision_name
        from ..ops import quant as Q

        x_new = self._prep_rows(x_new_in)
        n_new, d = x_new.shape
        nb_old = self._graph.shape[0]
        deg = self._graph.shape[1]
        is_l2 = self._is_l2_like()
        internal = self._internal_metric()
        prune_l2 = internal != M.IP
        prec = matmul_precision_name()

        # 1. candidate pools from the existing graph
        efc = int(min(max(deg + 16, 64), 128, nb_old))
        cand_l = []
        chunk = 4096
        for s0 in range(0, n_new, chunk):
            xc = x_new[s0 : s0 + chunk]
            _, ic = beam_search(
                jax.device_put(self._pad_q(xc)),
                self._store, self._graph_dev, self._entry_dev, None,
                kind=self._kind, ef=efc, k=efc, deg=deg,
                max_iters=2 * efc + 32, is_l2=is_l2,
                is_jaccard=internal == M.JACCARD, prec=prec,
                beam_width=max(1, min(8, efc // 16)),
                route_cents=self._entry_cents_dev,
                n_seed=0 if self._entry_cents_dev is None else int(min(max(8, efc // 8), 64)),
            )
            cand_l.append(np.asarray(ic)[: xc.shape[0]])
        cand = np.concatenate(cand_l) if len(cand_l) > 1 else cand_l[0]

        # 2. intra-batch candidates (ids offset into the combined row space)
        if n_new > 1:
            intra = _approx_knn_graph(x_new, min(16, n_new - 1), internal)
            intra = np.where(intra >= 0, intra.astype(np.int32) + nb_old, -1)
            cand = np.concatenate([cand.astype(np.int32), intra], axis=1)

        x_old = self._prep_rows(self._raw_host)
        x_all_dev = jax.device_put(
            np.concatenate([x_old, x_new]).astype(np.float32)
        )

        def prune_rows(node_ids: np.ndarray, cand_ids: np.ndarray) -> np.ndarray:
            """Chunked prune with uniform jit shapes (-1 padded rows)."""
            n = node_ids.shape[0]
            PC = 2048
            out = np.empty((n, deg), np.int32)
            for s0 in range(0, n, PC):
                e0 = min(s0 + PC, n)
                nid = np.zeros(PC, np.int32)
                cid = np.full((PC, cand_ids.shape[1]), -1, np.int32)
                nid[: e0 - s0] = node_ids[s0:e0]
                cid[: e0 - s0] = cand_ids[s0:e0]
                res = prune_candidates_ids(
                    x_all_dev, jax.device_put(cid), jax.device_put(nid),
                    deg=deg, is_l2=prune_l2,
                )
                out[s0:e0] = np.asarray(res)[: e0 - s0]
            return out

        # 3. new nodes' adjacency
        new_ids = np.arange(n_new, dtype=np.int32) + nb_old
        new_adj = prune_rows(new_ids, cand)
        graph = np.concatenate([self._graph, new_adj], axis=0)

        # 4. reverse-edge repair of touched nodes
        src = np.repeat(new_ids, deg)
        dst = new_adj.reshape(-1)
        ok = dst >= 0
        src, dst = src[ok], dst[ok]
        if dst.size:
            R = 8  # cap incoming per node; overflow pairs drop (rare)
            order = np.argsort(dst, kind="stable")
            src, dst = src[order], dst[order]
            change = np.empty(dst.size, bool)
            change[0] = True
            change[1:] = dst[1:] != dst[:-1]
            grp_start = np.nonzero(change)[0]
            rank = np.arange(dst.size) - grp_start[np.cumsum(change) - 1]
            keepp = rank < R
            src, dst, rank = src[keepp], dst[keepp], rank[keepp]
            affected = np.unique(dst)
            inc = np.full((affected.size, R), -1, np.int32)
            inc[np.searchsorted(affected, dst), rank] = src
            cand_aff = np.concatenate([graph[affected], inc], axis=1)
            graph[affected] = prune_rows(affected.astype(np.int32), cand_aff)

        self._graph = graph

        # 5. storage appends (codecs stay as trained — reference semantics:
        # Add encodes with the codebooks from Train)
        self._raw_host = np.concatenate([self._raw_host, np.asarray(x_new_in)])
        if self.VARIANT == "flat":
            self._payload["data"] = np.concatenate(
                [self._payload["data"], x_new.astype(self._payload["data"].dtype)]
            )
        elif self.VARIANT == "sq":
            if "data" in self._payload:  # FP16/BF16 raw store
                self._payload["data"] = np.concatenate(
                    [self._payload["data"], x_new.astype(self._payload["data"].dtype)]
                )
            else:
                self._payload["codes"] = np.concatenate(
                    [self._payload["codes"], Q.sq_encode(self._sq, x_new)]
                )
        elif self.VARIANT == "lvq":
            # mean stays as trained (reference: Add encodes with Train's codec)
            lvq = Q.LVQCodec(mean=self._payload["lvq_mean"])
            codes_new, off_new, scale_new = Q.lvq_encode(lvq, x_new)
            self._payload["codes"] = np.concatenate([self._payload["codes"], codes_new])
            self._payload["lvq_off"] = np.concatenate([self._payload["lvq_off"], off_new])
            self._payload["lvq_scale"] = np.concatenate(
                [self._payload["lvq_scale"], scale_new]
            )
        elif self.VARIANT == "leanvec":
            # basis stays as trained (reference: Add encodes with Train's codec)
            self._payload["data_lv"] = np.concatenate(
                [
                    self._payload["data_lv"],
                    ((x_new - self._lv_mean[None, :]) @ self._lv_proj).astype(np.float32),
                ]
            )
        elif self.VARIANT == "pq":
            self._payload["codes"] = np.concatenate(
                [self._payload["codes"], Q.pq_encode(self._pq, x_new)]
            )
        elif self.VARIANT == "prq":
            books = self._prq_books  # (nrq, m, ksub, sub_dim)
            nrq, m, ksub, _ = books.shape
            nbits = int(round(np.log2(ksub)))
            resid = x_new.copy()
            codes_new = np.empty((n_new, nrq * m), np.uint8)
            for s in range(nrq):
                pq = Q.PQCodec(codebooks=books[s], m=m, nbits=nbits)
                c = Q.pq_encode(pq, resid)
                codes_new[:, s * m : (s + 1) * m] = c
                resid = resid - np.asarray(
                    Q.pq_decode_dev(jax.device_put(books[s]), jax.device_put(c))
                )
            self._payload["codes"] = np.concatenate([self._payload["codes"], codes_new])
        if "refine" in self._payload:
            kind = self._refine_cfg or "raw"
            if kind == "raw":
                app = x_new.astype(np.float32)
            elif kind == "sq8":
                sq = Q.SQCodec(
                    "SQ8", self._payload["refine_vmin"], self._payload["refine_vdiff"], dim=d
                )
                app = Q.sq_encode(sq, x_new)
            elif kind == "fp16":
                app = x_new.astype(np.float16)
            else:  # bf16
                import ml_dtypes

                app = x_new.astype(ml_dtypes.bfloat16)
            self._payload["refine"] = np.concatenate([self._payload["refine"], app])
        self._upload()

    # --- search --------------------------------------------------------------
    def _effective_ef(self, cfg: Config, k: int) -> int:
        ef = cfg.get("ef")
        if ef is None:
            ef = max(k, 16)  # reference defaults ef from k
        return int(max(ef, k))

    def Search(self, dataset: DataSet, cfg: Config, bitset: BitsetView) -> "expected[DataSet]":
        with self._lock:
            self._flush_pending()
            if self._graph is None:
                return expected.Err(Status.empty_index, "index not built")
            metric = normalize_metric(cfg.metric_type)
            if metric != self._metric:
                return expected.Err(
                    Status.invalid_metric_type,
                    f"index built with {self._metric}, searched with {metric}",
                )
            k = cfg.k
            ef = self._effective_ef(cfg, k)
            xq = self._prep_rows(np.asarray(dataset.tensor))
            nq = xq.shape[0]

            # dense-filter fallback to exact scan (reference conditional
            # wrapper). Materialized-view hints (reference comp/
            # materialized_view.h:21-45, consumed by the HNSW conditional
            # wrapper): a pure-AND expression touching few field categories
            # means the filter is clustered, where graph walks strand —
            # fall back to exact scan earlier.
            ratio = bitset.filter_ratio() if not bitset.empty_view() else 0.0
            threshold = BRUTE_FORCE_FALLBACK_RATIO
            mv = cfg.get("materialized_view_search_info")
            if isinstance(mv, dict):
                touched = mv.get("field_id_to_touched_categories_cnt", {})
                few_categories = touched and max(touched.values()) <= 2
                if mv.get("is_pure_and", False) and not mv.get("has_not", False) and few_categories:
                    threshold = min(threshold, 0.5)
            if ratio >= threshold and not cfg.get("disable_fallback_brute_force", False):
                dists, ids = self._brute_force(xq, k, bitset)
                return expected.Ok(GenResultDataSet(nq, k, ids, dists))

            # re-searching the same DataSet (knob ladders, repeat calls) must
            # not re-upload the queries: ~50MB/s + ~30ms flat per h2d here
            q_pad_dev = dataset.cached_device(
                f"hnsw_qpad:{self._metric}:{self.data_type}",
                lambda: jax.device_put(self._pad_q(xq)),
            )
            dists, ids = self._graph_search(
                xq, k, ef, bitset, refine_k=int(cfg.get("refine_k", 1) or 1),
                q_pad_dev=q_pad_dev,
            )
            # under filters the walk may strand some queries: exact-fill them
            if not bitset.empty_view():
                n_valid = self.Count() - bitset.count()
                want = min(k, n_valid)
                unfilled = (ids >= 0).sum(1) < want
                if unfilled.any():
                    bd, bi = self._brute_force(xq[unfilled], k, bitset)
                    dists[unfilled], ids[unfilled] = bd, bi
            return expected.Ok(GenResultDataSet(nq, k, ids, dists))

    def _pad_q(self, a: np.ndarray) -> np.ndarray:
        from ..ops.distances import pad_rows_ladder

        return pad_rows_ladder(a)

    def _graph_search(self, xq, k, ef, bitset: BitsetView, refine_k: int = 1,
                      q_pad_dev=None):
        if self._inline is not None:
            return self._graph_search_inline(xq, k, ef, bitset, refine_k,
                                             q_pad_dev=q_pad_dev)
        xq_full = xq
        if self._lv_proj is not None:
            # LeanVec: the walk scores in the PCA-reduced frame; the refine
            # below reranks the candidates with the FULL-dim queries
            xq = ((xq - self._lv_mean[None, :]) @ self._lv_proj).astype(np.float32)
            q_pad_dev = None  # cached upload is full-dim
        nq = xq.shape[0]
        is_l2 = self._is_l2_like()
        internal = self._internal_metric()
        keep = (
            bitset.device_mask(self.Count()) if not bitset.empty_view() else None
        )
        k_out = k if self._refine_store is None else max(k, k * max(refine_k, 1))
        k_out = min(k_out, ef)
        if self._lv_proj is not None:
            # LeanVec reranks the ENTIRE search window at full dim (SVS
            # semantics: the window IS the rerank pool) — reduced-dim scores
            # only order the walk, never the returned top-k
            k_out = ef
        from ..ops.distances import matmul_precision_name

        deg = self._graph.shape[1]
        d = xq.shape[1]
        # beamwidth: expand W nodes per step (fewer sequential while_loop
        # dispatches, W x the MXU work per step); scale with ef so small-ef
        # walks stay greedy enough to match reference recall at equal ef.
        # Ring-sweep ablation (ops/graph.py visited-ring note): W=ef//8
        # matched or beat W=ef//16 recall at +15-20% QPS.
        W = max(1, min(8, ef // 8))
        max_iters = (2 * ef) // W + 32
        # chunk queries so each step's neighbor-gather stays under ~512MB
        chunk = 16384
        while chunk > 256 and chunk * W * deg * d * 4 > (1 << 29):
            chunk //= 2

        entry_dev = self._entry_dev
        if entry_dev is None:
            entry_dev = self._entry_dev = jax.device_put(self._entry)
        # per-query routed seeds when centroids exist; seed count scales with
        # ef so high-recall searches cast a wider net
        n_seed = 0 if self._entry_cents_dev is None else int(min(max(8, ef // 8), 64))
        prec = matmul_precision_name()
        from ..comp import check_current_cancellation

        from ..ops.ivf_scan import pack_results, unpack_results

        scores_l, ids_l = [], []
        for s0 in range(0, nq, chunk):
            check_current_cancellation()  # per-chunk (ivf.cc:962 analog)
            xc = xq[s0 : s0 + chunk]
            if s0 == 0 and nq <= chunk and q_pad_dev is not None:
                qc_dev = q_pad_dev  # cached upload (knob ladders, re-search)
            else:
                xq_pad = (
                    self._pad_q(xc)
                    if nq <= chunk
                    else np.concatenate(
                        [xc, np.zeros((chunk - xc.shape[0], d), xc.dtype)]
                    )
                    if xc.shape[0] < chunk
                    else xc
                )
                qc_dev = jax.device_put(xq_pad)
            sc, ic = beam_search(
                qc_dev,
                self._store,
                self._graph_dev,
                entry_dev,
                keep,
                kind=self._kind,
                ef=ef,
                k=k_out,
                deg=deg,
                max_iters=max_iters,
                is_l2=is_l2,
                is_jaccard=internal == M.JACCARD,
                has_mask=keep is not None,
                prec=prec,
                beam_width=W,
                route_cents=self._entry_cents_dev,
                n_seed=n_seed,
                compact_ratio=GRAPH_COMPACT_RATIO if W > 1 else 1.0,
            )
            # scores+ids cross to the host in ONE packed transfer (~30ms
            # flat per d2h sync on this platform)
            sh, ih = unpack_results(np.asarray(pack_results(sc, ic)))
            scores_l.append(sh[: xc.shape[0]])
            ids_l.append(ih[: xc.shape[0]])
        scores = np.concatenate(scores_l) if len(scores_l) > 1 else scores_l[0][:nq]
        ids = np.concatenate(ids_l) if len(ids_l) > 1 else ids_l[0][:nq]
        if self._refine_store is not None:
            dists, ids = refine_topk(jax.device_put(xq_full), self._refine_store, ids, k, is_l2)
            invalid = ids < 0
        else:
            scores, ids = scores[:, :k], ids[:, :k]
            if internal == M.JACCARD:
                dists = 1.0 - scores
            elif is_l2:
                qsq = np.sum(xq.astype(np.float64) ** 2, axis=1).astype(np.float32)
                dists = qsq[:, None] - scores
            else:
                dists = scores
            invalid = ids < 0
        dists = np.where(invalid, np.float32(np.inf if is_l2 else -np.inf), dists)
        return dists, ids.astype(np.int64)

    def _graph_search_inline(self, xq, k, ef, bitset: BitsetView, refine_k: int = 1,
                             q_pad_dev=None):
        """Inline-neighborhood walk (ops/graph_inline.py). Scores returned are
        EXACT under the stored values (raw f32 / SQ8 decode) via the built-in
        final rerank, so downstream dist conversion matches the general path."""
        from ..ops.graph_inline import beam_search_inline
        from ..ops.ivf_scan import pack_results, unpack_results

        inline = self._inline
        nq, d = xq.shape
        is_l2 = self._internal_metric() == M.L2
        keep = bitset.device_mask(self.Count()) if not bitset.empty_view() else None
        k_out = k if self._refine_store is None else max(k, k * max(refine_k, 1))
        k_out = min(k_out, ef)
        deg = inline.deg
        # W=ef//8 was tuned before the flat ~30ms tunnel-sync tax was measured
        # and subtracted (benchmark/inline_profile.py); the corrected profile
        # shows narrower beams win per-step (W=2: 57.8ms vs W=3: 76ms walk at
        # ef=24, 1M x 128). KNOWHERE_INLINE_W overrides for on-chip A/Bs.
        W = int(_os.environ.get("KNOWHERE_INLINE_W", "0")) or max(1, min(8, ef // 8))
        n_steps = ef // W + 6
        n_seed = int(min(max(8, ef // 8), 64, ef))
        ring_slots = max(1, 256 // (W * deg))
        chunk = 16384
        # bound the per-step candidate tensor (nq, W*deg, d) bf16 AND the
        # final exact-rerank tensor (nq, ef, d) f32 (iterator/range calls use
        # ef in the thousands) to ~512-768MB
        while chunk > 256 and (
            chunk * W * deg * d * 2 > (3 << 28) or chunk * ef * d * 4 > (1 << 29)
        ):
            chunk //= 2

        if self._entry_dev is None:
            self._entry_dev = jax.device_put(self._entry)
        if self._entry_cents_dev is None:
            self._entry_cents_dev = jax.device_put(self._entry_cents)
        outs = []
        for s0 in range(0, nq, chunk):
            xc = xq[s0 : s0 + chunk]
            if s0 == 0 and nq <= chunk and q_pad_dev is not None:
                qc_dev = q_pad_dev  # cached upload (knob ladders, re-search)
            else:
                if nq <= chunk:
                    xc = self._pad_q(xc)
                elif xc.shape[0] < chunk:
                    xc = np.concatenate([xc, np.zeros((chunk - xc.shape[0], d), xc.dtype)])
                qc_dev = jax.device_put(xc)
            rs, ri = beam_search_inline(
                inline.table,
                qc_dev,
                inline.rerank0, inline.rerank1, inline.rerank2,
                self._entry_dev,
                self._entry_cents_dev,
                inline.vmin, inline.vdiff,
                keep,
                W=W, ef=ef, deg=deg, n_steps=n_steps, ring_slots=ring_slots,
                n_seed=n_seed, k=k_out, is_l2=is_l2, has_mask=keep is not None,
                rerank_kind=inline.rerank_kind, bits=inline.bits,
            )
            outs.append(pack_results(rs, ri))  # async across chunks
        # ONE host transfer per chunk (scores+ids bit-packed; ~30ms flat per
        # d2h sync on this platform, so never two)
        parts = [unpack_results(np.asarray(p)) for p in outs]
        scores = np.concatenate([s for s, _ in parts])[:nq]
        ids = np.concatenate([i for _, i in parts])[:nq]
        if self._refine_store is not None:
            dists, ids = refine_topk(jax.device_put(xq), self._refine_store, ids, k, is_l2)
            invalid = ids < 0
        else:
            scores, ids = scores[:, :k], ids[:, :k]
            if is_l2:
                qsq = np.sum(xq.astype(np.float64) ** 2, axis=1).astype(np.float32)
                dists = qsq[:, None] - scores
            else:
                dists = scores
            invalid = ids < 0
        dists = np.where(invalid, np.float32(np.inf if is_l2 else -np.inf), dists)
        return dists, ids.astype(np.int64)

    def _brute_force(self, xq, k, bitset: BitsetView):
        internal = self._internal_metric()
        metric_for_scan = M.L2 if internal == M.HAMMING else internal
        # LeanVec's raw store is reduced-dim — exact scans must use the
        # full-dim refine payload instead
        data = (
            self._store["data"]
            if self._kind == "raw" and self._lv_proj is None
            else (
                self._refine_store.data
                if self._refine_store is not None and self._refine_store.kind == "raw"
                else None
            )
        )
        if data is None:
            # decode-free fallback: use compute rows from host payload
            data = jax.device_put(self._decode_all())
        mask = bitset.device_mask(self.Count()) if not bitset.empty_view() else None
        if internal == M.JACCARD:
            from ..ops import topk as T

            # jaccard over bit planes via dedicated tile metric
            d_np, i_np = T.knn_search(xq, data, k, M.JACCARD, bitset_mask=mask)
            return d_np, i_np
        d_dev, i_dev = knn_device(jax.device_put(xq), data, k, metric_for_scan, mask=mask)
        d_np, i_np = np.asarray(d_dev), np.asarray(i_dev, dtype=np.int64)
        if internal == M.HAMMING:
            pass  # L2 on bit planes == hamming
        return d_np, i_np

    def _decode_all(self) -> np.ndarray:
        if self.VARIANT == "flat":
            return np.asarray(self._payload["data"], dtype=np.float32)
        if "refine" in self._payload:
            # every refine kind is full-dim and decodable — this is the only
            # full-dim store for leanvec (walk store is PCA-reduced) and for
            # pq/prq with a non-raw refine (ADVICE r4)
            kind = self._refine_cfg or "raw"
            ref = self._payload["refine"]
            if kind == "raw":
                return ref
            if kind == "sq8":
                sq = Q.SQCodec(
                    "SQ8",
                    self._payload["refine_vmin"],
                    self._payload["refine_vdiff"],
                    dim=ref.shape[1],
                )
                return np.asarray(
                    Q.sq_decode_dev(
                        sq,
                        jax.device_put(ref),
                        jax.device_put(sq.vmin),
                        jax.device_put(sq.vdiff),
                    )
                )
            return np.asarray(ref, dtype=np.float32)  # fp16 / bf16
        if self.VARIANT == "sq":
            if "data" in self._payload:  # FP16/BF16 raw store
                return np.asarray(self._payload["data"], dtype=np.float32)
            return np.asarray(
                Q.sq_decode_dev(
                    self._sq,
                    jax.device_put(self._payload["codes"]),
                    jax.device_put(self._sq.vmin),
                    jax.device_put(self._sq.vdiff),
                )
            )
        if self.VARIANT == "pq":
            return np.asarray(
                Q.pq_decode_dev(jax.device_put(self._pq.codebooks), jax.device_put(self._payload["codes"]))
            )
        if self.VARIANT == "lvq":
            return np.asarray(
                Q.lvq_decode_dev(
                    jax.device_put(self._payload["codes"]),
                    jax.device_put(self._payload["lvq_off"]),
                    jax.device_put(self._payload["lvq_scale"]),
                    jax.device_put(self._payload["lvq_mean"]),
                )
            )
        raise KnowhereException("cannot decode", Status.internal_error)

    # --- full-coverage tail scan (iterator / range-search completion) -----------
    def _full_sorted(self, xq: np.ndarray, bitset: BitsetView):
        """Covering exact-over-stored-rows scan: (dists, ids) each (nq, n_valid)
        sorted best-first in the native convention. Graph walks can never
        guarantee full coverage (disconnected nodes); the reference iterator
        contract requires it (index_node.h:672-808), so the final round scans
        the decoded store directly."""
        data = self._decode_all().astype(np.float64)
        nq = xq.shape[0]
        is_l2 = self._is_l2_like()
        internal = self._internal_metric()
        larger = self._larger_is_closer()
        keep = bitset.host_mask(self.Count()) if not bitset.empty_view() else None
        worst = np.float32(-np.inf if larger else np.inf)
        nb = data.shape[0]
        dists = np.empty((nq, nb), np.float32)
        q64 = xq.astype(np.float64)
        for s in range(0, nb, 65536):
            e = min(s + 65536, nb)
            blk = data[s:e]
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
        if keep is not None:
            dists[:, ~keep[:nb]] = worst
            n_valid = int(keep[:nb].sum())
        else:
            n_valid = nb
        order = np.argsort(-dists if larger else dists, axis=1, kind="stable")[:, :n_valid]
        return np.take_along_axis(dists, order, 1), order.astype(np.int64)

    # --- range search / iterator ------------------------------------------------
    def RangeSearch(self, dataset: DataSet, cfg: Config, bitset: BitsetView) -> "expected[DataSet]":
        # expanding-ef graph walk, then radius filter (reference uses the
        # iterator; direct expansion is equivalent and batched)
        with self._lock:
            self._flush_pending()
            if self._graph is None:
                return expected.Err(Status.empty_index, "index not built")
            xq = self._prep_rows(np.asarray(dataset.tensor))
            nq = xq.shape[0]
            radius = cfg.get("radius", 0.0)
            range_filter = cfg.get("range_filter", float("inf"))
            two_sided = np.isfinite(range_filter)
            larger = self._larger_is_closer()
            ef = self._effective_ef(cfg, 64)
            from ..index_node import DEVICE_K_MAX

            n_valid = self.Count() - (bitset.count() if not bitset.empty_view() else 0)
            cap = min(n_valid, DEVICE_K_MAX)
            k_cur = min(max(ef, 64), max(cap, 1))
            while True:
                dists, ids = self._graph_search(xq, k_cur, max(k_cur, ef), bitset)
                if k_cur >= cap:
                    break
                frontier = dists[:, -1]
                still = (frontier > radius) if larger else (frontier < radius)
                still &= ids[:, -1] >= 0
                if not still.any():
                    break
                k_cur = min(cap, k_cur * 4)
            # queries whose results may still be growing (frontier in range,
            # or the walk ran dry before surfacing every valid row): complete
            # them with the covering full scan — a graph walk alone cannot
            # guarantee coverage (disconnected nodes)
            returned = (ids >= 0).sum(axis=1)
            frontier = dists[:, -1]
            frontier_in = (frontier > radius) if larger else (frontier < radius)
            needy = (returned < n_valid) & (frontier_in | (ids[:, -1] < 0))
            if needy.any():
                act = np.nonzero(needy)[0]
                pad = n_valid - dists.shape[1]
                if pad > 0:
                    dists = np.pad(dists, ((0, 0), (0, pad)),
                                   constant_values=np.float32(-np.inf if larger else np.inf))
                    ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
                for s in range(0, len(act), 64):  # bound host memory
                    sub = act[s : s + 64]
                    d_f, i_f = self._full_sorted(xq[sub], bitset)
                    dists[sub], ids[sub] = d_f, i_f
            import numpy as _np

            lims = _np.zeros(nq + 1, dtype=_np.int64)
            out_i, out_d = [], []
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
                sel = _np.nonzero(keep_i)[0]
                if rsk is not None and rsk >= 0:
                    sel = sel[:rsk]
                out_i.append(ids[i, sel])
                out_d.append(dists[i, sel])
                lims[i + 1] = lims[i] + len(sel)
            from ..dataset import GenRangeResultDataSet

            ids_cat = _np.concatenate(out_i) if out_i else _np.empty(0, _np.int64)
            d_cat = _np.concatenate(out_d) if out_d else _np.empty(0, _np.float32)
            return expected.Ok(GenRangeResultDataSet(nq, ids_cat, d_cat, lims))

    def AnnIterator(
        self, dataset: DataSet, cfg: Config, bitset: BitsetView, use_knowhere_search_pool=True
    ) -> "expected[List]":
        with self._lock:
            self._flush_pending()
            if self._graph is None:
                return expected.Err(Status.empty_index, "index not built")
            xq = self._prep_rows(np.asarray(dataset.tensor))
            nq = xq.shape[0]
            seed_ef = int(cfg.get("seed_ef") or cfg.get("ef") or 64)
            larger = self._larger_is_closer()
            count = self.Count()
            from ..index_node import DEVICE_K_MAX, ExpandingIteratorGroup

            k0 = min(count, max(seed_ef * 4, 1024))

            # Resumable walk rounds (reference FaissHnswIterator resumes the
            # graph walk, faiss_hnsw.cc:843-940): widen ef/k x4 per round; the
            # covering final round is an exact scan of the decoded store
            # (graph reachability alone cannot guarantee full drain).
            covered = {"done": False}

            def round_fn(r: int):
                if covered["done"]:
                    return None
                k_r = min(count, k0 << (2 * r))
                if k_r >= count or k_r > DEVICE_K_MAX:
                    covered["done"] = True
                    with self._lock:
                        d_f, i_f = self._full_sorted(xq, bitset)
                    return i_f, d_f
                with self._lock:
                    dists, ids = self._graph_search(xq, k_r, max(k_r, seed_ef), bitset)
                return ids, dists

            group = ExpandingIteratorGroup(nq, count, round_fn)
            return expected.Ok(
                [group.make_iterator(i, larger_is_closer=larger) for i in range(nq)]
            )

    # --- vectors / meta --------------------------------------------------------
    def GetVectorByIds(self, dataset: DataSet) -> "expected[DataSet]":
        if not self.HasRawData(self._metric):
            return expected.Err(Status.not_implemented, "no raw data stored")
        with self._lock:
            self._flush_pending()
            ids = np.asarray(dataset.ids, dtype=np.int64)
            if ids.min(initial=0) < 0 or ids.max(initial=-1) >= self.Count():
                return expected.Err(Status.invalid_args, "id out of range")
            if self._is_binary():
                bits = self._payload.get("bits_raw")
                return expected.Ok(GenTensorDataSet(bits[ids], len(ids), self._dim))
            return expected.Ok(GenTensorDataSet(self._raw_host[ids], len(ids), self._dim))

    def IsAdditionalScalarSupported(self, is_mv_only: bool = False) -> bool:
        # this node consumes materialized_view_search_info (earlier BF
        # fallback on clustered filters) — reference HNSW conditional wrapper
        return True

    def CalcDistByIDs(self, query_ds, bitset, ids, rows) -> "expected[np.ndarray]":
        xq = self._prep_rows(np.asarray(query_ds.tensor))
        sub = self._prep_rows(self._raw_host[np.asarray(ids)]) if self._raw_host is not None else self._decode_all()[np.asarray(ids)]
        internal = self._internal_metric()
        q_dev, s_dev = jax.device_put(xq), jax.device_put(np.asarray(sub, np.float32))
        dmat = np.asarray(D.pairwise_distance(internal, q_dev, s_dev, D.base_aux(internal, s_dev)))
        return expected.Ok(dmat)

    def HasRawData(self, metric_type: str = "L2") -> bool:
        # flat HNSW keeps raw rows; quantized variants only via raw refine
        if self.VARIANT == "flat":
            return True
        return self._refine_cfg == "raw"

    def GetIndexMeta(self, cfg: Config) -> "expected[DataSet]":
        import json as _json

        from ..feder import hnsw_overview

        if self._graph is None:
            return expected.Err(Status.empty_index, "index not built")
        overview = hnsw_overview(
            self._graph, self._entry, int(cfg.get("overview_levels", 3) or 3)
        )
        overview.update(
            {"metric_type": self._metric, "M": self._M, "dim": self._dim, "count": self.Count()}
        )
        ds = DataSet()
        ds.set("json_info", _json.dumps(overview))
        return expected.Ok(ds)

    def GetFederVisit(self, dataset: DataSet, cfg: Config) -> "expected[DataSet]":
        """trace_visit search replay (reference feder trace_visit + FederResult)."""
        import json as _json

        from ..feder import instrumented_walk

        if self._graph is None:
            return expected.Err(Status.empty_index, "index not built")
        xq = self._prep_rows(np.asarray(dataset.tensor))
        ef = self._effective_ef(cfg, cfg.get("k", 10) or 10)
        x_host = self._decode_all() if self.VARIANT != "flat" else self._payload["data"]
        traces = [
            instrumented_walk(x_host, self._graph, self._entry, q, ef, is_l2=self._is_l2_like())
            for q in xq
        ]
        ds = DataSet()
        ds.set("json_id_set", _json.dumps(traces))
        return expected.Ok(ds)

    # --- serialization -----------------------------------------------------------
    def Serialize(self, binset: BinarySet) -> Status:
        with self._lock:
            self._flush_pending()
            if self._graph is None:
                return Status.empty_index
            arrays = {"graph": self._graph, "entry": self._entry}
            if self._entry_cents is not None:
                arrays["entry_cents"] = self._entry_cents
            payload_is_raw = self._payload.get("data") is self._raw_host
            for k_, v in self._payload.items():
                if payload_is_raw and k_ == "data":
                    continue  # typed flat: payload IS the raw rows — write once
                arrays["payload_" + k_] = np.asarray(v)
            if self._raw_host is not None:
                arrays["raw"] = np.asarray(self._raw_host)
            meta = {
                "variant": self.VARIANT,
                "metric": self._metric,
                "dim": self._dim,
                "M": self._M,
                "data_type": self.data_type,
                "refine_cfg": self._refine_cfg,
                "payload_is_raw": payload_is_raw,
            }
            if self._sq is not None:
                meta["sq_type"] = self._sq.sq_type
                if self._sq.vmin is not None:  # FP16/BF16 codecs carry no grid
                    arrays["sq_vmin"] = self._sq.vmin
                    arrays["sq_vdiff"] = self._sq.vdiff
            if self._pq is not None:
                arrays["pq_codebooks"] = self._pq.codebooks
                meta["pq_nbits"] = self._pq.nbits
            if self._prq_books is not None:
                arrays["prq_codebooks"] = self._prq_books
            if self._lv_proj is not None:
                arrays["lv_proj"] = self._lv_proj
                arrays["lv_mean"] = self._lv_mean
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
            self._M = int(meta["M"])
            self.data_type = meta.get("data_type", "fp32")
            self._refine_cfg = meta.get("refine_cfg")
            self._graph = np.asarray(arrays["graph"])
            self._entry = np.asarray(arrays["entry"])
            self._entry_cents = (
                np.asarray(arrays["entry_cents"]) if "entry_cents" in arrays else None
            )
            self._raw_host = np.asarray(arrays["raw"]) if "raw" in arrays else None
            self._payload = {
                k_[len("payload_") :]: np.asarray(v)
                for k_, v in arrays.items()
                if k_.startswith("payload_")
            }
            if meta.get("payload_is_raw") and self._raw_host is not None:
                self._payload["data"] = self._raw_host
            if "sq_type" in meta:
                self._sq = Q.SQCodec(
                    meta["sq_type"],
                    np.asarray(arrays["sq_vmin"]) if "sq_vmin" in arrays else None,
                    np.asarray(arrays["sq_vdiff"]) if "sq_vdiff" in arrays else None,
                    dim=self._dim,
                )
            if "pq_codebooks" in arrays:
                books = np.asarray(arrays["pq_codebooks"])
                self._pq = Q.PQCodec(books, books.shape[0], int(meta.get("pq_nbits", 8)))
            if "prq_codebooks" in arrays:
                self._prq_books = np.asarray(arrays["prq_codebooks"])
            if "lv_proj" in arrays:
                self._lv_proj = np.asarray(arrays["lv_proj"], dtype=np.float32)
                self._lv_mean = np.asarray(arrays["lv_mean"], dtype=np.float32)
            self._upload()
        return Status.success

    # --- introspection ---------------------------------------------------------------
    def Dim(self) -> int:
        return self._dim

    def Size(self) -> int:
        total = 0 if self._graph is None else self._graph.nbytes
        total += sum(np.asarray(v).nbytes for v in self._payload.values())
        return total

    def Count(self) -> int:
        base = 0 if self._graph is None else self._graph.shape[0]
        return base + sum(p.shape[0] for p in self._pending)

    def Type(self) -> str:
        return self.index_type

    @classmethod
    def CreateConfig(cls) -> Config:
        return _CONFIGS[cls.VARIANT]()


class HnswFlatNode(HnswIndexNode):
    VARIANT = "flat"


class HnswSqNode(HnswIndexNode):
    VARIANT = "sq"


class HnswPqNode(HnswIndexNode):
    VARIANT = "pq"


class HnswPrqNode(HnswIndexNode):
    VARIANT = "prq"


_F = feature
_DENSE = ("fp32", "fp16", "bf16", "int8")

register_index(
    IndexEnum.INDEX_HNSW, _DENSE + ("bin1",),
    _F.ALL_DENSE_TYPE | _F.BINARY | _F.KNN | _F.MMAP | _F.MV | _F.EMB_LIST,
)(HnswFlatNode)
register_index(IndexEnum.INDEX_HNSW_SQ, _DENSE, _F.ALL_DENSE_TYPE | _F.KNN | _F.MMAP)(HnswSqNode)
register_index(IndexEnum.INDEX_HNSW_PQ, _DENSE, _F.ALL_DENSE_TYPE | _F.KNN | _F.MMAP)(HnswPqNode)
register_index(IndexEnum.INDEX_HNSW_PRQ, _DENSE, _F.ALL_DENSE_TYPE | _F.KNN | _F.MMAP)(HnswPrqNode)

# CAGRA lives in models/cagra.py with the full cuVS config surface and knob
# translation (itopk_size->ef, graph_degree->2*M, refine_ratio->refine_k).
