"""Multi-chip sharding layer — database sharded over an ICI mesh.

The reference has NO distributed layer: Milvus shards data into segments, each
with its own single-process Knowhere index, and merges top-k on the CPU
(SURVEY.md §2 "Parallelism strategies", §5.8). This module is the TPU-native
first-class replacement: one LOGICAL index whose base rows are sharded across
a `jax.sharding.Mesh` axis ("shard"), with

- search  = shard_map'ed per-shard fused distance+top-k, then a global merge
  via all_gather over ICI + final top-k (log-tree merge handled by XLA),
- k-means training = data-parallel Lloyd: per-shard assign + partial sums,
  psum over the mesh, replicated centroid update,
- the same program runs single-chip (mesh of 1) so correctness tests run on a
  CPU mesh (--xla_force_host_platform_device_count).

Multi-host DCN meshes use the identical program (jax global arrays).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..ops import distances as D

AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def shard_rows(mesh: Mesh, x: np.ndarray) -> jax.Array:
    """Put a (rows, d) host array onto the mesh, row-sharded. Rows are padded
    to a multiple of the mesh size with +0 rows; callers track true counts."""
    n = mesh.devices.size
    rows = x.shape[0]
    pad = (-rows) % n
    if pad:
        x = np.concatenate([x, np.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
    return jax.device_put(x, NamedSharding(mesh, P(AXIS, *([None] * (x.ndim - 1)))))


def replicate(mesh: Mesh, x: np.ndarray) -> jax.Array:
    return jax.device_put(np.asarray(x), NamedSharding(mesh, P(*([None] * np.asarray(x).ndim))))


# ---------------------------------------------------------------------------
# Sharded search: per-shard top-k + all_gather merge
# ---------------------------------------------------------------------------


def sharded_search(
    mesh: Mesh,
    queries: jax.Array,
    base: jax.Array,
    k: int,
    metric_name: str,
    aux: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    valid_rows: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """queries replicated, base row-sharded -> (dists (nq,k), ids (nq,k)) replicated.

    ids are GLOBAL row indices (shard offset added inside the shard_map);
    `valid_rows` masks out padding rows introduced by shard_rows.
    """
    metric_name = metric_name.upper()
    n_shards = mesh.devices.size
    nb_total = base.shape[0]
    nb_per = nb_total // n_shards
    larger = D.larger_is_better(metric_name)
    sign = 1.0 if larger else -1.0
    kk = min(k, nb_per)

    in_specs = [P(None, None), P(AXIS, None)]
    args = [queries, base]
    if aux is not None:
        in_specs.append(P(AXIS))
        args.append(aux)
    if mask is not None:
        in_specs.append(P(AXIS))
        args.append(mask)

    def local_search(q, xb, *rest):
        i = 0
        aux_l = rest[i] if aux is not None else None
        i += aux is not None
        mask_l = rest[i] if mask is not None else None
        dist = D.pairwise_distance(metric_name, q, xb, aux_l)
        score = dist * sign
        shard_id = jax.lax.axis_index(AXIS)
        row0 = shard_id * nb_per
        if valid_rows is not None:
            gids_local = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, nb_per), 1)
            score = jnp.where(gids_local < valid_rows, score, -jnp.inf)
        if mask_l is not None:
            score = jnp.where(mask_l[None, :], score, -jnp.inf)
        s, idx = jax.lax.top_k(score, kk)
        gids = idx.astype(jnp.int32) + row0
        # merge across shards: gather everyone's top-k, re-select
        all_s = jax.lax.all_gather(s, AXIS, axis=1).reshape(s.shape[0], -1)
        all_i = jax.lax.all_gather(gids, AXIS, axis=1).reshape(s.shape[0], -1)
        best_s, sel = jax.lax.top_k(all_s, k)
        best_i = jnp.take_along_axis(all_i, sel, axis=1)
        best_i = jnp.where(best_s == -jnp.inf, -1, best_i)
        return best_s * sign, best_i

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn)(*args)


# ---------------------------------------------------------------------------
# Data-parallel k-means step (Lloyd) with psum merge
# ---------------------------------------------------------------------------


def sharded_kmeans_step(mesh: Mesh, base: jax.Array, centroids: jax.Array) -> jax.Array:
    """One Lloyd iteration over a row-sharded base: replicated new centroids."""
    k = centroids.shape[0]

    def step(xb, c):
        c32 = c.astype(jnp.float32)
        x32 = xb.astype(jnp.float32)
        c_sq = jnp.sum(c32**2, axis=1)
        dot = jax.lax.dot_general(
            x32, c32, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        assign = jnp.argmin(c_sq[None, :] - 2.0 * dot, axis=1)
        sums = jax.ops.segment_sum(x32, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((x32.shape[0],), jnp.float32), assign, num_segments=k)
        sums = jax.lax.psum(sums, AXIS)
        counts = jax.lax.psum(counts, AXIS)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts == 0)[:, None], c32, new_c)

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,
    )
    return jax.jit(fn)(base, centroids)


def _kmeanspp_init(x: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ seeding on a host subsample: guarantees cluster coverage that
    plain random picks miss (the per-iteration reseed in ops/kmeans.py plays
    the same role on the single-chip path)."""
    sample = x[rng.choice(x.shape[0], size=min(x.shape[0], k * 64), replace=False)]
    centers = [sample[rng.integers(sample.shape[0])]]
    d2 = ((sample - centers[0]) ** 2).sum(1)
    for _ in range(1, k):
        probs = d2 / max(d2.sum(), 1e-12)
        nxt = sample[rng.choice(sample.shape[0], p=probs)]
        centers.append(nxt)
        d2 = np.minimum(d2, ((sample - nxt) ** 2).sum(1))
    return np.stack(centers).astype(np.float32)


def sharded_kmeans(
    mesh: Mesh, x: np.ndarray, k: int, n_iters: int = 12, seed: int = 1234
) -> np.ndarray:
    """Full data-parallel k-means over the mesh; returns centroids (k,d)."""
    rng = np.random.default_rng(seed)
    init = _kmeanspp_init(np.asarray(x, dtype=np.float32), k, rng)
    base = shard_rows(mesh, x)
    cents = replicate(mesh, init)
    for _ in range(n_iters):
        cents = sharded_kmeans_step(mesh, base, cents)
    return np.asarray(cents)


class ShardedFlatIndex:
    """A logical FLAT index sharded across the mesh — the multi-chip serving
    path for exact search (the building block the IVF/graph sharded variants
    compose with)."""

    def __init__(self, mesh: Mesh, metric: str = "L2"):
        self.mesh = mesh
        self.metric = metric.upper()
        self._base = None
        self._aux = None
        self._rows = 0

    def build(self, xb: np.ndarray) -> None:
        self._rows = xb.shape[0]
        self._base = shard_rows(self.mesh, np.asarray(xb))
        # aux is computed shard-local (sharding propagates through jnp ops)
        self._aux = jax.jit(lambda b: D.base_aux(self.metric, b))(self._base) if self.metric != "IP" else None

    def search(self, xq: np.ndarray, k: int, bitset_keep: Optional[np.ndarray] = None):
        q = replicate(self.mesh, np.asarray(xq))
        mask = None
        if bitset_keep is not None:
            pad = self._base.shape[0] - bitset_keep.shape[0]
            if pad:
                bitset_keep = np.concatenate([bitset_keep, np.zeros(pad, bool)])
            mask = jax.device_put(bitset_keep, NamedSharding(self.mesh, P(AXIS)))
        dists, ids = sharded_search(
            self.mesh, q, self._base, k, self.metric,
            aux=self._aux, mask=mask, valid_rows=self._rows,
        )
        return np.asarray(dists), np.asarray(ids, dtype=np.int64)


class ShardedGraphIndex:
    """A logical graph (HNSW-family) index sharded across devices.

    The Milvus-host pattern for graph indexes (one HNSW per segment, CPU-side
    top-k merge — SURVEY §5.8) becomes one logical index: rows split
    contiguously across devices, each device holds an independent flat
    diversified graph over its shard (ops/graph.build_graph), searches
    dispatch each device's batched beam walk asynchronously (jax dispatch is
    non-blocking, so the N walks overlap), and per-shard top-k merges on the
    host. Per-shard graphs match the reference's per-segment recall contract;
    a cross-shard graph would need neighbor gathers over ICI per hop, which
    the measured ~90 Mrows/s gather floor makes strictly worse than N
    independent walks."""

    def __init__(self, devices=None, metric: str = "L2"):
        self.devices = list(devices) if devices is not None else jax.devices()
        self.metric = metric.upper()
        self._shards = []  # per device: dict(store, graph, entry, cents, row0, rows)
        self._rows = 0
        self._xb = None  # host copy (serialization + GetVectorByIds)
        self._host_graphs = []  # per shard: dict(graph, entry, row0, rows, deg)

    def build(self, xb: np.ndarray, M: int = 16, ef_construction: int = 200) -> None:
        from ..ops.graph import build_graph, pick_entry_points

        xb = np.asarray(xb, dtype=np.float32)
        self._rows, d = xb.shape
        self._xb = xb
        n = len(self.devices)
        bounds = np.linspace(0, self._rows, n + 1).astype(np.int64)
        deg = max(2 * M, 4)
        self._host_graphs = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            lo, hi = int(lo), int(hi)
            x_local = xb[lo:hi]
            if x_local.shape[0] == 0:
                continue
            deg_l = min(deg, max(x_local.shape[0] - 1, 1))
            inter = min(
                max(deg_l, min(ef_construction // 4, 128)), max(x_local.shape[0] - 1, 1)
            )
            graph = build_graph(x_local, deg_l, self.metric, intermediate_deg=inter)
            entry = pick_entry_points(x_local, n_entry=min(64, x_local.shape[0]))
            self._host_graphs.append(
                {"graph": graph, "entry": entry.astype(np.int32), "row0": lo,
                 "rows": x_local.shape[0], "deg": deg_l}
            )
        self._distribute()

    def _distribute(self) -> None:
        """Place per-shard graphs onto the current device set (round-robin —
        the shard count is fixed at build; a load onto fewer devices stacks
        several shards per device, onto more leaves some idle). Runs at build
        AND after deserialize."""
        import os

        xb = self._xb
        d = xb.shape[1]
        self._shards = []
        inline_mode = os.environ.get("KNOWHERE_GRAPH_INLINE", "auto")
        for si, hg in enumerate(self._host_graphs):
            dev = self.devices[si % len(self.devices)]
            lo = hg["row0"]
            x_local = xb[lo : lo + hg["rows"]]
            graph = hg["graph"]
            deg_l = hg["deg"]
            sh = {
                "device": dev,
                "store": {"data": jax.device_put(x_local, dev)},
                "graph": jax.device_put(graph, dev),
                "entry": jax.device_put(hg["entry"], dev),
                "row0": lo,
                "rows": x_local.shape[0],
                "deg": deg_l,
            }
            # per-shard inline fast path (ops/graph_inline.py): same gating as
            # the single-chip HNSW node, budget applied per device
            use_inline = inline_mode != "0" and d % 4 == 0 and (
                inline_mode == "1" or x_local.shape[0] >= 100_000
            )
            if use_inline:
                from ..ops.graph_inline import inline_row_words, make_inline_store
                from ..ops.kmeans import kmeans as _kmeans
                from ..ops import topk as _T
                from ..ops import distances as _D

                budget = float(os.environ.get("KNOWHERE_INLINE_BUDGET_GB", "6")) * (1 << 30)
                bits = int(os.environ.get("KNOWHERE_INLINE_BITS", "8"))
                bits = bits if bits in (4, 8) else 8
                if d % (32 // bits) != 0:
                    bits = 8  # make_inline_store falls back too; budget must match
                tbytes = x_local.shape[0] * inline_row_words(deg_l, d, bits) * 4
                if inline_mode == "1" or tbytes <= budget:
                    try:
                        with jax.default_device(dev):
                            nc = min(64, max(8, x_local.shape[0] // 32))
                            cents, _ = _kmeans(x_local, nc, n_iters=6)
                            aux = _D.base_aux("L2", sh["store"]["data"])
                            eids, _ = _T.knn_search(
                                cents, sh["store"]["data"], 1, "L2", aux=aux
                            )
                            sh["inline"] = make_inline_store(
                                graph, "raw", sh["store"], x_host=x_local, bits=bits
                            )
                            sh["inline_entry"] = jax.device_put(
                                eids.reshape(-1).astype(np.int32)
                            )
                            sh["inline_cents"] = jax.device_put(cents.astype(np.float32))
                    except Exception:
                        sh.pop("inline", None)
            self._shards.append(sh)

    def search(
        self,
        xq: np.ndarray,
        k: int,
        ef: Optional[int] = None,
        bitset_keep: Optional[np.ndarray] = None,
    ):
        from ..ops.graph import beam_search

        xq = np.asarray(xq, dtype=np.float32)
        nq = xq.shape[0]
        ef = max(ef or max(k, 32), k)
        is_l2 = self.metric == "L2"
        partials = []
        for sh in self._shards:
            q_dev = jax.device_put(xq, sh["device"])
            ef_l = min(ef, sh["rows"])
            keep_l = None
            if bitset_keep is not None:
                keep_l = jax.device_put(
                    np.asarray(bitset_keep[sh["row0"] : sh["row0"] + sh["rows"]]),
                    sh["device"],
                )
            if "inline" in sh:
                from ..ops.graph_inline import beam_search_inline

                inline = sh["inline"]
                W = max(1, min(8, ef_l // 8))
                n_seed = int(min(max(8, ef_l // 8), 64, ef_l, sh["inline_entry"].shape[0]))
                with jax.default_device(sh["device"]):
                    s, ids = beam_search_inline(
                        inline.table, q_dev,
                        inline.rerank0, inline.rerank1, inline.rerank2,
                        sh["inline_entry"], sh["inline_cents"],
                        inline.vmin, inline.vdiff, keep_l,
                        W=W, ef=ef_l, deg=sh["deg"],
                        n_steps=ef_l // W + 6,
                        ring_slots=max(1, 256 // (W * sh["deg"])),
                        n_seed=n_seed, k=min(k, sh["rows"]),
                        is_l2=is_l2, has_mask=keep_l is not None, rerank_kind="raw",
                        bits=inline.bits,
                    )
            else:
                s, ids = beam_search(
                    q_dev, sh["store"], sh["graph"], sh["entry"], keep_l,
                    kind="raw", ef=ef_l, k=min(k, sh["rows"]), deg=sh["deg"],
                    max_iters=2 * ef_l + 32, is_l2=is_l2,
                    has_mask=keep_l is not None,
                )
            partials.append((s, ids, sh["row0"]))
        # host merge of per-shard top-k (ids -> global row space)
        cat_s = np.concatenate([np.asarray(s) for s, _, _ in partials], axis=1)
        cat_i = np.concatenate(
            [np.where(np.asarray(i) >= 0, np.asarray(i).astype(np.int64) + r0, -1)
             for _, i, r0 in partials],
            axis=1,
        )
        order = np.argsort(-cat_s, axis=1, kind="stable")[:, :k]
        best_s = np.take_along_axis(cat_s, order, 1)
        best_i = np.take_along_axis(cat_i, order, 1)
        if is_l2:
            qsq = np.sum(xq.astype(np.float64) ** 2, 1).astype(np.float32)
            dists = np.where(best_i >= 0, qsq[:, None] - best_s, np.inf)
        else:
            dists = np.where(best_i >= 0, best_s, -np.inf)
        if best_i.shape[1] < k:
            padw = k - best_i.shape[1]
            dists = np.pad(dists, ((0, 0), (0, padw)),
                           constant_values=np.inf if is_l2 else -np.inf)
            best_i = np.pad(best_i, ((0, 0), (0, padw)), constant_values=-1)
        return dists[:nq], best_i[:nq]


class ShardedIVFIndex:
    """A logical IVF index whose inverted lists are sharded across devices.

    The Milvus-host pattern (one Knowhere index per segment, CPU-side top-k
    merge — SURVEY §5.8) becomes one logical index: centroids are replicated,
    lists are round-robin-packed onto devices by size (balanced rows/device),
    a search computes probes once and dispatches each device's local scan
    asynchronously (jax dispatch is non-blocking, so the N scans overlap),
    and per-device top-k results merge on the host. Works identically on a
    CPU mesh and a real multi-chip ICI topology; on one device it degrades to
    the single-chip engine.
    """

    def __init__(self, devices=None, metric: str = "L2"):
        import jax as _jax

        self.devices = list(devices) if devices is not None else _jax.devices()
        self.metric = metric.upper()
        self._centroids = None
        self._shards = []  # per device: dict(store=..., offsets, row_ids, list_map)
        self._nlist = 0
        self._rows = 0
        self._kind = "raw"
        self._sq_levels = 0
        self._variant = "flat"
        self._assign = None  # (rows,) int32 — global list assignment (host)
        self._payload = None  # (rows, ·) raw f32 / sq u8 / pq codes (host)

    def build(
        self,
        xb: np.ndarray,
        nlist: int = 1024,
        n_iters: int = 12,
        variant: str = "flat",  # flat | sq8 | pq
        m: int = 16,
        nbits: int = 8,
        refine: bool = False,
    ) -> None:
        from ..ops.kmeans import kmeans
        from ..ops import quant as Q

        xb = np.asarray(xb, dtype=np.float32)
        self._rows, d = xb.shape
        self._nlist = min(nlist, max(1, self._rows // 39))
        centroids, assign = kmeans(xb, self._nlist, n_iters=n_iters)
        self._centroids = centroids
        # refine payload (fp16 rows, GLOBAL order — sliced per shard at
        # distribute time): without it the PQ variant ranks purely by ADC,
        # which capped Deep10M-regime recall at ~0.78 even at full probe
        self._refine_payload = (
            xb.astype(np.float16) if (refine and variant == "pq") else None
        )
        # codec training is GLOBAL (one codebook for the logical index) so a
        # query's ADC tables work identically on every shard; payload is
        # encoded once in global row order so it can be serialized and
        # re-distributed onto a different device set at load time
        self._variant = variant
        if variant == "pq":
            self._pq = Q.pq_train(xb - centroids[assign], m, nbits)
            self._kind = "pq"
            payload = Q.pq_encode(self._pq, xb - centroids[assign])
        elif variant == "sq8":
            self._sq = Q.sq_train(xb, "SQ8")
            self._kind = "sq"
            self._sq_levels = self._sq.levels
            payload = Q.sq_encode(self._sq, xb)
        else:
            self._kind = "raw"
            payload = xb
        self._assign = assign.astype(np.int32)
        self._payload = payload
        self._distribute()

    def _distribute(self) -> None:
        """Place the logical index (global payload + list assignment) onto the
        current device set: biggest-list-first onto the lightest device. Runs
        at build AND after deserialize, so a serialized index re-shards onto
        whatever mesh the loading process has."""
        assign = self._assign
        payload = self._payload
        d = self._payload.shape[1] if self._kind == "raw" else None
        # balance lists over devices: biggest-list-first onto lightest device
        counts = np.bincount(assign, minlength=self._nlist)
        order = np.argsort(-counts)
        loads = np.zeros(len(self.devices), dtype=np.int64)
        owner = np.zeros(self._nlist, dtype=np.int32)
        for li in order:
            dev = int(np.argmin(loads))
            owner[li] = dev
            loads[dev] += counts[li]

        self._shards = []
        for di, dev in enumerate(self.devices):
            local_lists = np.nonzero(owner == di)[0]
            sel = np.isin(assign, local_lists)
            rows_idx = np.nonzero(sel)[0]
            a_local = assign[rows_idx]
            # remap global list ids -> local contiguous ids
            lmap = {int(g): i for i, g in enumerate(local_lists)}
            a_remap = np.fromiter((lmap[int(a)] for a in a_local), dtype=np.int64, count=len(a_local))
            ordr = np.argsort(a_remap, kind="stable")
            rows_sorted = rows_idx[ordr]
            offsets = np.zeros(len(local_lists) + 1, np.int64)
            np.cumsum(np.bincount(a_remap, minlength=len(local_lists)), out=offsets[1:])
            cents_local = self._centroids[local_lists]  # local list id -> centroid
            store = {"centroids": jax.device_put(cents_local, dev)}
            codes = payload[rows_sorted]
            if self._kind == "pq":
                pad = np.zeros((2048, codes.shape[1]), codes.dtype)
                store["codes"] = jax.device_put(np.concatenate([codes, pad]), dev)
                store["codebooks"] = jax.device_put(self._pq.codebooks, dev)
                if self._refine_payload is not None:
                    rp = self._refine_payload[rows_sorted]
                    store["refine"] = jax.device_put(
                        np.concatenate([rp, np.zeros((2048, rp.shape[1]), rp.dtype)]),
                        dev,
                    )
            elif self._kind == "sq":
                pad = np.zeros((2048, codes.shape[1]), codes.dtype)
                store["codes"] = jax.device_put(np.concatenate([codes, pad]), dev)
                store["vmin"] = jax.device_put(self._sq.vmin, dev)
                store["vdiff"] = jax.device_put(self._sq.vdiff, dev)
            else:
                pad = np.zeros((2048, d), np.float32)
                store["data"] = jax.device_put(np.concatenate([codes, pad]), dev)
                store["norms"] = jax.device_put(
                    np.concatenate(
                        [np.sum(codes.astype(np.float64) ** 2, 1).astype(np.float32), np.zeros(2048, np.float32)]
                    ),
                    dev,
                )
            self._shards.append(
                {
                    "device": dev,
                    "store": store,
                    "offsets": offsets,
                    "row_ids": rows_sorted.astype(np.int64),
                    "global_to_local": np.full(self._nlist, -1, np.int32),
                }
            )
            self._shards[-1]["global_to_local"][local_lists] = np.arange(len(local_lists), dtype=np.int32)

    def search(
        self,
        xq: np.ndarray,
        k: int,
        nprobe: int = 8,
        bitset_keep: Optional[np.ndarray] = None,
        refine_k: int = 1,
    ):
        from ..ops.ivf_scan import coarse_probe_host, ivf_scan_search
        from ..ops.refine import RefineStore, refine_topk

        xq = np.asarray(xq, dtype=np.float32)
        nq = xq.shape[0]
        is_l2 = self.metric == "L2"
        # coarse probe against the GLOBAL centroids (per-shard stores hold
        # local-list centroids for the decode paths)
        probes = coarse_probe_host(xq, self._centroids, min(nprobe, self._nlist), is_l2)
        partials = []
        for sh in self._shards:
            local = sh["global_to_local"][probes]  # -1 where not owned here
            if (local < 0).all():
                continue
            q_dev = jax.device_put(xq, sh["device"])
            keep_sorted = None
            if bitset_keep is not None:
                # bitset is in global row order; the scan reads rows in this
                # shard's list-sorted order (+2048 pad rows, masked out)
                ks = bitset_keep[sh["row_ids"]]
                keep_sorted = jax.device_put(
                    np.concatenate([ks, np.zeros(2048, bool)]), sh["device"]
                )
            has_refine = "refine" in sh["store"]
            k_local = min(k, max(len(sh["row_ids"]), 1))
            k_scan = (
                min(max(k_local, k_local * max(refine_k, 1), 32), max(len(sh["row_ids"]), 1))
                if has_refine
                else k_local
            )
            s, p = ivf_scan_search(
                q_dev, sh["store"], self._kind, local, sh["offsets"],
                k_scan, is_l2,
                keep_sorted=keep_sorted,
                sq_levels=self._sq_levels,
            )
            if has_refine:
                # exact re-rank of the ADC pool on this shard's fp16 rows —
                # positions index the shard-sorted storage, same as the store
                d_r, p = refine_topk(
                    q_dev, RefineStore("raw", sh["store"]["refine"]), p,
                    k_local, is_l2,
                )
                s = -d_r if is_l2 else d_r  # back to larger-is-better scores
                # refined L2 scores are TRUE distances negated; the ADC-score
                # branch below subtracts from |q|^2, so pre-compensate here
                if is_l2:
                    qsq = np.sum(xq.astype(np.float64) ** 2, 1).astype(np.float32)
                    s = s + qsq[:, None]
            ids = np.where(p >= 0, sh["row_ids"][np.clip(p, 0, max(len(sh["row_ids"]) - 1, 0))], -1)
            partials.append((s, ids))
        # host merge of per-shard top-k
        cat_s = np.concatenate([s for s, _ in partials], axis=1)
        cat_i = np.concatenate([i for _, i in partials], axis=1)
        order = np.argsort(-cat_s, axis=1, kind="stable")[:, :k]
        best_s = np.take_along_axis(cat_s, order, 1)
        best_i = np.take_along_axis(cat_i, order, 1)
        if is_l2:
            qsq = np.sum(xq.astype(np.float64) ** 2, 1).astype(np.float32)
            dists = qsq[:, None] - best_s
            dists = np.where(best_i >= 0, dists, np.inf)
        else:
            dists = np.where(best_i >= 0, best_s, -np.inf)
        return dists, best_i
