"""emb_list — multi-vector (late-interaction) documents: MAX_SIM / DTW.

Behavioral parity target: the reference's emb_list machinery in the IndexNode
base + strategies (reference: include/knowhere/index/index_node.h:388-523
Build/Search/SerializeEmbListIfNeed glue, src/index/index_node.cc:251-293
two-stage search; src/index/emb_list/emb_list_strategy_tokenann.cc,
emb_list_strategy_muvera.cc:89-431 SimHash-partitioned FDE,
emb_list_strategy_lemur.cc + simple_mlp.h learned compression;
include/knowhere/emb_list_utils.h EmbListOffset).

A document is a list of vectors: dataset tensor (total_tokens, dim) + lims
(ndocs+1). Metrics: MAX_SIM[_COSINE|_IP|_L2|...] (sum over query tokens of the
best token match) and DTW[_*] (dynamic-time-warping aggregate). Strategies:

- tokenann: index every token in an underlying ANN index; stage 1 retrieves
  token neighbors per query token; stage 2 reranks candidate docs with exact
  token-vs-token tiles on the MXU (CalcDistByIDs equivalent).
- muvera: fixed-dimensional encoding — tokens are SimHash-partitioned
  (num_projections sign bits, num_repeats independent repetitions) and summed
  per partition after a random down-projection; docs become single FDE
  vectors in the underlying index; exact rerank follows.
- lemur: a small MLP (trained in-process with SGD/optax — the reference
  hand-rolls the same over CBLAS) maps tokens to a learned space whose
  mean-pool approximates MaxSim ranking; pooled vectors are indexed; exact
  rerank follows.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..binaryset import BinarySet
from ..bitset import BitsetView
from ..config import Config, Stage
from ..dataset import DataSet, GenDataSetFromArray, GenResultDataSet
from ..index_param import (
    DTW_METRICS,
    MAX_SIM_METRICS,
    metric as M,
    normalize_metric,
)
from ..io.serialize import read_sections, write_sections
from ..ops import distances as D
from ..status import KnowhereException, Status, expected

# emb_list metric -> underlying token metric (reference index_param.h:255-275)
_BASE_METRIC = {
    M.MAX_SIM: M.COSINE,
    M.MAX_SIM_COSINE: M.COSINE,
    M.MAX_SIM_IP: M.IP,
    M.MAX_SIM_L2: M.L2,
    M.MAX_SIM_HAMMING: M.HAMMING,
    M.MAX_SIM_JACCARD: M.JACCARD,
    M.DTW: M.COSINE,
    M.DTW_COSINE: M.COSINE,
    M.DTW_IP: M.IP,
    M.DTW_L2: M.L2,
    M.DTW_HAMMING: M.HAMMING,
    M.DTW_JACCARD: M.JACCARD,
}


def is_emb_list_metric(m: str) -> bool:
    return m.upper() in _BASE_METRIC


class EmbListOffset:
    """Offset table: token position -> doc id (reference emb_list_utils.h:29-60)."""

    def __init__(self, lims: np.ndarray):
        self.lims = np.asarray(lims, dtype=np.int64)

    @property
    def num_docs(self) -> int:
        return len(self.lims) - 1

    def doc_of_token(self, token_ids: np.ndarray) -> np.ndarray:
        return np.searchsorted(self.lims, token_ids, side="right") - 1

    def tokens_of_doc(self, doc: int) -> Tuple[int, int]:
        return int(self.lims[doc]), int(self.lims[doc + 1])


def _token_sim_matrix(q_tokens: np.ndarray, d_tokens: np.ndarray, base_metric: str) -> np.ndarray:
    """(nq_tok, nd_tok) similarity (larger=better) on device."""
    qd = jax.device_put(q_tokens.astype(np.float32))
    dd = jax.device_put(d_tokens.astype(np.float32))
    dist = np.asarray(D.pairwise_distance(base_metric, qd, dd, D.base_aux(base_metric, dd)))
    if base_metric in (M.L2, M.HAMMING, M.JACCARD):
        return -dist
    return dist


def max_sim_score(sim: np.ndarray) -> float:
    """Sum over query tokens of the best document-token similarity."""
    if sim.size == 0:
        return -np.inf
    return float(sim.max(axis=1).sum())


def dtw_score(sim: np.ndarray) -> float:
    """DTW aggregate over the (query_tokens x doc_tokens) similarity grid:
    maximize accumulated similarity along a monotone alignment path."""
    nq, nd = sim.shape
    if nq == 0 or nd == 0:
        return -np.inf
    acc = np.full((nq + 1, nd + 1), -np.inf)
    acc[0, 0] = 0.0
    for i in range(1, nq + 1):
        for j in range(1, nd + 1):
            best_prev = max(acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
            acc[i, j] = sim[i - 1, j - 1] + best_prev
    return float(acc[nq, nd])


_DTW_NEG = np.float32(-1e30)


def dtw_scores_batch(sim: np.ndarray, col_starts: np.ndarray, col_ends: np.ndarray) -> np.ndarray:
    """DTW aggregate for MANY candidate documents at once: the per-cell
    Python DP of dtw_score becomes an anti-diagonal wavefront vectorized over
    candidates AND the diagonal (O(nq_tok + nd_tok) numpy steps instead of
    O(nq_tok * nd_tok * n_cand) Python iterations). Segments are columns of
    one (nq_tok, total_cand_tokens) similarity tile."""
    C = len(col_starts)
    nqt = sim.shape[0]
    lens = (col_ends - col_starts).astype(np.int64)
    ndt = int(lens.max())
    s3 = np.full((C, nqt, ndt), _DTW_NEG, np.float32)
    for ci in range(C):
        s3[ci, :, : lens[ci]] = sim[:, col_starts[ci] : col_ends[ci]]
    acc = np.full((C, nqt, ndt), _DTW_NEG, np.float32)
    for dg in range(nqt + ndt - 1):
        i0, i1 = max(0, dg - ndt + 1), min(nqt - 1, dg)
        ii = np.arange(i0, i1 + 1)
        jj = dg - ii
        prev = np.full((C, ii.size), _DTW_NEG, np.float32)
        m = (ii > 0) & (jj > 0)
        if m.any():
            prev[:, m] = acc[:, ii[m] - 1, jj[m] - 1]
        prev[:, (ii == 0) & (jj == 0)] = 0.0
        m = ii > 0
        if m.any():
            prev[:, m] = np.maximum(prev[:, m], acc[:, ii[m] - 1, jj[m]])
        m = jj > 0
        if m.any():
            prev[:, m] = np.maximum(prev[:, m], acc[:, ii[m], jj[m] - 1])
        acc[:, ii, jj] = s3[:, ii, jj] + prev
    out = acc[np.arange(C), nqt - 1, lens - 1]
    return np.where(lens > 0, out, np.float32(-np.inf))


def max_sim_scores_batch(sim: np.ndarray, col_starts: np.ndarray, col_ends: np.ndarray) -> np.ndarray:
    """MaxSim for many candidates: per-query-token best within each column
    segment (np.maximum.reduceat over contiguous segments), summed."""
    lens = col_ends - col_starts
    if (lens <= 0).any():  # degenerate empty docs: fall back per candidate
        return np.asarray(
            [max_sim_score(sim[:, a:b]) for a, b in zip(col_starts, col_ends)],
            np.float32,
        )
    best = np.maximum.reduceat(sim, col_starts, axis=1)  # (nq_tok, C)
    return best.sum(axis=0).astype(np.float32)


class EmbListIndex:
    """Adapter holding an underlying dense index + the emb_list strategy.

    Created by the facade when the config metric is MAX_SIM_*/DTW_* and the
    wrapped index type supports emb_list (reference BuildEmbListIfNeed)."""

    def __init__(self, make_underlying, index_type: str):
        self._make_underlying = make_underlying
        self.index_type = index_type
        self._under = None  # IndexNode
        self._offset: Optional[EmbListOffset] = None
        self._tokens: Optional[np.ndarray] = None  # raw token vectors (rerank)
        self._metric = M.MAX_SIM_COSINE
        self._strategy = "tokenann"
        self._fde_params: Dict = {}
        self._mlp_params = None

    # --- strategies: doc -> retrieval vectors ------------------------------------
    def _muvera_fde(self, tokens: np.ndarray, lims: np.ndarray, query: bool = False) -> np.ndarray:
        p = self._fde_params
        rng = np.random.default_rng(p["seed"])
        n_bits = int(p["num_projections"])  # uncapped, as in the reference
        B = 1 << n_bits
        reps = int(p["num_repeats"])
        d = tokens.shape[1]
        d_proj = min(d, max(8, 64 // max(reps // 4, 1)))
        if reps * B * d_proj > (1 << 22):
            # refuse loudly instead of silently shrinking the FDE
            raise KnowhereException(
                f"muvera FDE dim {reps * B * d_proj} too large "
                f"(num_projections={n_bits}, num_repeats={reps})",
                Status.invalid_args,
            )
        planes, projs = [], []
        for r in range(reps):
            planes.append(rng.standard_normal((d, n_bits)).astype(np.float32))
            projs.append(rng.standard_normal((d, d_proj)).astype(np.float32) / np.sqrt(d))
        t_dev = jax.device_put(tokens.astype(np.float32))
        parts_all, proj_all = [], []
        for r in range(reps):
            bits = np.asarray(t_dev @ jax.device_put(planes[r])) > 0
            part = (bits * (1 << np.arange(n_bits))[None, :]).sum(axis=1)
            parts_all.append(part)
            proj_all.append(np.asarray(t_dev @ jax.device_put(projs[r])))
        ndocs = len(lims) - 1
        # scatter every token into its (doc, partition) cell in one pass per
        # rep — no per-document Python loop (corpus-scale builds)
        doc_of_tok = (
            np.searchsorted(lims, np.arange(tokens.shape[0]), side="right") - 1
        ).astype(np.int64)
        out = np.zeros((ndocs, reps * B * d_proj), dtype=np.float32)
        for r in range(reps):
            seg = out[:, r * B * d_proj : (r + 1) * B * d_proj].reshape(ndocs, B, d_proj)
            np.add.at(seg, (doc_of_tok, parts_all[r]), proj_all[r])
            if not query:
                counts = np.zeros((ndocs, B), np.float32)
                np.add.at(counts, (doc_of_tok, parts_all[r]), 1.0)
                nz = counts > 0
                seg[nz] /= counts[nz][:, None]  # doc side: partition centroid
        return out

    def _train_lemur(self, tokens: np.ndarray, lims: np.ndarray, cfg: Config) -> np.ndarray:
        """Train the LEMUR MLP in-process (reference simple_mlp.h SGD loop)."""
        import optax

        hidden = int(cfg.get("lemur_hidden_dim", 128) or 128)
        layers = int(cfg.get("lemur_num_layers", 2) or 2)
        epochs = int(cfg.get("lemur_num_epochs", 10) or 10)
        batch = int(cfg.get("lemur_batch_size", 256) or 256)
        lr = float(cfg.get("lemur_learning_rate", 1e-3) or 1e-3)
        n_samples = int(cfg.get("lemur_num_train_samples", 10000) or 10000)
        seed = int(cfg.get("lemur_seed", 0) or 0)
        base_metric = _BASE_METRIC[self._metric]

        rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        d = tokens.shape[1]
        dims = [d] + [hidden] * layers
        params = []
        for i in range(layers):
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (dims[i], dims[i + 1])) * np.sqrt(2.0 / dims[i])
            params.append({"w": w, "b": jnp.zeros(dims[i + 1])})

        def mlp(params, x):
            h = x
            for i, layer in enumerate(params):
                h = h @ layer["w"] + layer["b"]
                if i < len(params) - 1:
                    h = jax.nn.relu(h)
            return h

        ndocs = len(lims) - 1
        offset = EmbListOffset(lims)

        # training pairs: (doc_i, doc_j) with exact MaxSim target
        n_pairs = min(n_samples, max(ndocs * 4, 64))
        di = rng.integers(0, ndocs, n_pairs)
        dj = rng.integers(0, ndocs, n_pairs)
        targets = np.empty(n_pairs, np.float32)
        max_tok = 0
        for p_ in range(n_pairs):
            s1, e1 = offset.tokens_of_doc(int(di[p_]))
            s2, e2 = offset.tokens_of_doc(int(dj[p_]))
            sim = _token_sim_matrix(tokens[s1:e1], tokens[s2:e2], base_metric)
            targets[p_] = max_sim_score(sim) / max(e1 - s1, 1)
            max_tok = max(max_tok, e1 - s1, e2 - s2)

        def pool(params, doc_tokens, mask):
            h = mlp(params, doc_tokens)
            return jnp.sum(h * mask[:, :, None], axis=1) / jnp.maximum(
                jnp.sum(mask, axis=1, keepdims=True), 1.0
            )

        def pad_docs(ids):
            out = np.zeros((len(ids), max_tok, d), np.float32)
            msk = np.zeros((len(ids), max_tok), np.float32)
            for r, doc in enumerate(ids):
                s, e = offset.tokens_of_doc(int(doc))
                out[r, : e - s] = tokens[s:e]
                msk[r, : e - s] = 1.0
            return out, msk

        opt = optax.adam(lr)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, xa, ma, xb, mb, t):
            def loss_fn(p):
                pa = pool(p, xa, ma)
                pb = pool(p, xb, mb)
                pred = jnp.sum(pa * pb, axis=1)
                return jnp.mean((pred - t) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state2, loss

        for _ in range(epochs):
            perm = rng.permutation(n_pairs)
            for s0 in range(0, n_pairs, batch):
                sel = perm[s0 : s0 + batch]
                if len(sel) < 2:
                    continue
                xa, ma = pad_docs(di[sel])
                xb, mb = pad_docs(dj[sel])
                params, opt_state, _ = step(
                    params, opt_state, jax.device_put(xa), jax.device_put(ma),
                    jax.device_put(xb), jax.device_put(mb), jax.device_put(targets[sel]),
                )
        self._mlp_params = jax.tree.map(np.asarray, params)

        # pooled doc embeddings
        pooled = np.empty((ndocs, dims[-1]), np.float32)
        for doc in range(ndocs):
            s, e = offset.tokens_of_doc(doc)
            h = np.asarray(mlp(params, jax.device_put(tokens[s:e].astype(np.float32))))
            pooled[doc] = h.mean(axis=0)
        return pooled

    def _lemur_encode_queries(self, q_tokens: np.ndarray, q_lims: np.ndarray) -> np.ndarray:
        def mlp(params, x):
            h = x
            for i, layer in enumerate(params):
                h = h @ layer["w"] + layer["b"]
                if i < len(params) - 1:
                    h = np.maximum(h, 0.0)
            return h

        nq = len(q_lims) - 1
        out = np.empty((nq, self._mlp_params[-1]["w"].shape[1]), np.float32)
        for i in range(nq):
            s, e = int(q_lims[i]), int(q_lims[i + 1])
            out[i] = mlp(self._mlp_params, q_tokens[s:e].astype(np.float32)).mean(axis=0)
        return out

    # --- lifecycle ----------------------------------------------------------------
    def Build(self, dataset: DataSet, cfg: Config) -> Status:
        self._metric = normalize_metric(cfg.metric_type)
        if self._metric not in _BASE_METRIC:
            return Status.invalid_metric_type
        lims = np.asarray(dataset.lims, dtype=np.int64)
        if lims is None or len(lims) < 2:
            raise KnowhereException("emb_list dataset requires lims", Status.invalid_args)
        tokens = np.asarray(dataset.tensor)
        self._offset = EmbListOffset(lims)
        self._tokens = tokens
        self._strategy = (cfg.get("emb_list_strategy") or "tokenann").lower()
        base_metric = _BASE_METRIC[self._metric]

        self._under = self._make_underlying()
        if self._strategy == "tokenann":
            retrieval = tokens
            retrieval_metric = base_metric
        elif self._strategy == "muvera":
            self._fde_params = {
                "num_projections": cfg.get("muvera_num_projections", 8) or 8,
                "num_repeats": cfg.get("muvera_num_repeats", 10) or 10,
                "seed": cfg.get("muvera_seed", 0) or 0,
            }
            retrieval = self._muvera_fde(tokens.astype(np.float32), lims)
            retrieval_metric = M.IP
        elif self._strategy == "lemur":
            retrieval = self._train_lemur(tokens.astype(np.float32), lims, cfg)
            retrieval_metric = M.IP
        else:
            return Status.invalid_value_in_json
        self._retrieval_metric = retrieval_metric

        under_cfg = self._under.CreateConfig()
        raw_cfg = cfg.to_dict()
        raw_cfg["metric_type"] = retrieval_metric
        st, msg = Config.load(under_cfg, raw_cfg, Stage.TRAIN)
        if st != Status.success:
            raise KnowhereException(msg, st)
        return self._under.Build(GenDataSetFromArray(np.ascontiguousarray(retrieval)), under_cfg)

    # --- search -------------------------------------------------------------------
    def Search(self, dataset: DataSet, cfg: Config, bitset: BitsetView) -> "expected[DataSet]":
        if self._under is None:
            return expected.Err(Status.empty_index, "emb_list index not built")
        metric = normalize_metric(cfg.metric_type)
        if metric != self._metric:
            return expected.Err(Status.invalid_metric_type, "metric mismatch")
        q_lims = np.asarray(dataset.lims, dtype=np.int64)
        q_tokens = np.asarray(dataset.tensor)
        nq = len(q_lims) - 1
        k = cfg.k
        base_metric = _BASE_METRIC[self._metric]
        ratio = float(cfg.get("retrieval_ann_ratio", 1.0) or 1.0)
        rerank = bool(cfg.get("emb_list_rerank", True))
        is_dtw = self._metric in DTW_METRICS

        # stage 1: candidate doc retrieval
        ndocs = self._offset.num_docs
        if self._strategy == "tokenann":
            k_tok = int(min(max(k * max(ratio, 1.0), k) * 4, max(self._tokens.shape[0], 1)))
            under_cfg = self._under.CreateConfig()
            Config.load(under_cfg, {"metric_type": self._retrieval_metric, "k": k_tok}, Stage.SEARCH)
            res = self._under.Search(GenDataSetFromArray(q_tokens), under_cfg, BitsetView.empty())
            if not res.has_value():
                return res
            tok_ids = res.value().ids.reshape(q_tokens.shape[0], k_tok)
            cand_per_q: List[np.ndarray] = []
            for i in range(nq):
                s, e = int(q_lims[i]), int(q_lims[i + 1])
                tids = tok_ids[s:e].reshape(-1)
                tids = tids[tids >= 0]
                docs = np.unique(self._offset.doc_of_token(tids))
                cand_per_q.append(docs)
        else:
            q_fde = (
                self._muvera_fde(q_tokens.astype(np.float32), q_lims, query=True)
                if self._strategy == "muvera"
                else self._lemur_encode_queries(q_tokens, q_lims)
            )
            k_doc = int(min(max(k * max(ratio, 1.0) * 4, k), ndocs))
            under_cfg = self._under.CreateConfig()
            Config.load(under_cfg, {"metric_type": self._retrieval_metric, "k": k_doc}, Stage.SEARCH)
            res = self._under.Search(GenDataSetFromArray(q_fde), under_cfg, BitsetView.empty())
            if not res.has_value():
                return res
            doc_ids = res.value().ids.reshape(nq, k_doc)
            cand_per_q = [np.unique(doc_ids[i][doc_ids[i] >= 0]) for i in range(nq)]

        # doc-level bitset filtering
        if not bitset.empty_view():
            keep = bitset.host_mask(ndocs)
            cand_per_q = [c[keep[c]] for c in cand_per_q]

        # stage 2: exact rerank with the emb_list aggregate
        out_ids = np.full((nq, k), -1, np.int64)
        out_d = np.zeros((nq, k), np.float32)
        for i in range(nq):
            s, e = int(q_lims[i]), int(q_lims[i + 1])
            qt = q_tokens[s:e]
            cands = cand_per_q[i]
            if len(cands) == 0:
                continue
            if rerank or self._strategy == "tokenann":
                # one device tile: query tokens vs ALL candidate tokens, then
                # one vectorized aggregate across every candidate segment
                spans = [self._offset.tokens_of_doc(int(c)) for c in cands]
                all_tok = np.concatenate([self._tokens[a:b] for a, b in spans])
                sim = _token_sim_matrix(qt, all_tok, base_metric)
                seg_lens = np.asarray([b - a for a, b in spans], np.int64)
                col_ends = np.cumsum(seg_lens)
                col_starts = col_ends - seg_lens
                scores = (
                    dtw_scores_batch(sim, col_starts, col_ends)
                    if is_dtw
                    else max_sim_scores_batch(sim, col_starts, col_ends)
                )
            else:
                scores = -np.arange(len(cands), dtype=np.float32)  # keep ANN order
            order = np.argsort(-scores, kind="stable")[:k]
            out_ids[i, : len(order)] = cands[order]
            out_d[i, : len(order)] = scores[order]
        return expected.Ok(GenResultDataSet(nq, k, out_ids, out_d))

    # --- persistence ------------------------------------------------------------------
    def GetEmbListByIds(self, dataset, metric_type: str = "L2"):
        """Per-document token vectors for the given emb_list ids (reference
        index.h:176-178): returns a tensor of concatenated vectors plus a
        lims array (EMB_LIST_OFFSET) marking per-document boundaries."""
        from ..dataset import DataSet as _DS
        from ..status import Status as _St, expected as _exp

        if self._offset is None or self._tokens is None:
            return _exp.Err(_St.empty_index, "index not built")
        ids = np.asarray(dataset.ids if dataset.ids is not None else dataset.tensor).reshape(-1).astype(np.int64)
        if ids.size and (ids.min() < 0 or ids.max() >= self._offset.num_docs):
            return _exp.Err(_St.invalid_args, "emb_list id out of range")
        spans = [self._offset.tokens_of_doc(int(i)) for i in ids]
        chunks = [self._tokens[a:b] for a, b in spans]
        out = np.concatenate(chunks) if chunks else np.empty((0, self._tokens.shape[1]), np.float32)
        lims = np.zeros(len(ids) + 1, np.int64)
        for j, (a, b) in enumerate(spans):
            lims[j + 1] = lims[j] + (b - a)
        ds = _DS(
            tensor=out,
            lims=lims,
            rows=len(ids),
            dim=out.shape[1] if out.size else self._tokens.shape[1],
        )
        return _exp.Ok(ds)

    def Serialize(self, binset: BinarySet) -> Status:
        if self._under is None:
            return Status.empty_index
        st = self._under.Serialize(binset)
        if st != Status.success:
            return st
        arrays = {"lims": self._offset.lims, "tokens": self._tokens}
        meta = {"metric": self._metric, "strategy": self._strategy, "fde": self._fde_params}
        if self._mlp_params is not None:
            for i, layer in enumerate(self._mlp_params):
                arrays[f"mlp_w{i}"] = layer["w"]
                arrays[f"mlp_b{i}"] = layer["b"]
            meta["mlp_layers"] = len(self._mlp_params)
        binset.Append("EMB_LIST_META", write_sections(arrays, meta=meta))
        return Status.success

    def Deserialize(self, binset: BinarySet, cfg: Config) -> Status:
        blob = binset.GetByName("EMB_LIST_META")
        if blob is None:
            return Status.invalid_binary_set
        arrays, meta = read_sections(blob.data)
        self._metric = meta["metric"]
        self._strategy = meta["strategy"]
        self._fde_params = meta.get("fde", {})
        self._offset = EmbListOffset(np.asarray(arrays["lims"]))
        self._tokens = np.asarray(arrays["tokens"])
        if "mlp_layers" in meta:
            self._mlp_params = [
                {"w": np.asarray(arrays[f"mlp_w{i}"]), "b": np.asarray(arrays[f"mlp_b{i}"])}
                for i in range(meta["mlp_layers"])
            ]
        self._retrieval_metric = (
            _BASE_METRIC[self._metric] if self._strategy == "tokenann" else M.IP
        )
        self._under = self._make_underlying()
        return self._under.Deserialize(binset, cfg)

    def Count(self) -> int:
        return 0 if self._offset is None else self._offset.num_docs

    def Dim(self) -> int:
        return 0 if self._tokens is None else self._tokens.shape[1]
