#!/usr/bin/env python
"""QPS-at-recall benchmark suite over every dense index family.

Methodology parity with the reference harness
(reference: benchmark/hdf5/benchmark_float_qps.cpp:80-161 — for each target
recall, binary-search the smallest search knob (nprobe / ef / reorder_k /
search_list_size) whose recall@k reaches it, then report nq/elapsed;
EXPECTED_RECALLs default {0.9}).

Datasets: ann-benchmarks HDF5 files load when present under ./data (SIFT/GIST
layouts: train/test/neighbors); otherwise a seeded SIFT-like clustered
gaussian corpus is generated and ground truth computed with the exact fp32
path (zero-egress environments).

Usage:
  python benchmark/suite.py [--nb 1000000] [--dim 128] [--recall 0.95]
                            [--index IVF_FLAT,IVF_PQ,SCANN,HNSW] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import knowhere_tpu as kt  # noqa: E402
from knowhere_tpu.ops.distances import DistancePrecision, set_distance_precision  # noqa: E402

# search-knob search spaces per index (reference sweeps the same knobs)
KNOBS = {
    "IVF_FLAT": ("nprobe", [1, 2, 4, 8, 16, 32, 64, 128, 256]),
    "IVF_SQ8": ("nprobe", [1, 2, 4, 8, 16, 32, 64, 128, 256]),
    "IVF_PQ": ("nprobe", [1, 2, 4, 8, 16, 32, 64, 128, 256]),
    "SCANN": ("nprobe", [1, 2, 4, 8, 16, 32, 64, 128, 256]),
    "IVF_RABITQ": ("nprobe", [1, 2, 4, 8, 16, 32, 64, 128, 256]),
    "HNSW": ("ef", [16, 32, 64, 128, 256, 512]),
    "DISKANN": ("search_list_size", [16, 32, 64, 128, 256, 512]),
    "FLAT": (None, [None]),
}

BUILD_CFG = {
    "IVF_FLAT": {"nlist": 1024},
    "IVF_SQ8": {"nlist": 1024, "sq_type": "SQ8"},
    "IVF_PQ": {"nlist": 1024, "m": 16, "nbits": 8, "refine": True, "refine_type": "FP16"},
    "SCANN": {"nlist": 1024, "sub_dim": 2, "with_raw_data": True},
    "IVF_RABITQ": {"nlist": 1024, "refine": True},
    "HNSW": {"M": 16, "efConstruction": 200},
    "FLAT": {},
}

SEARCH_EXTRA = {
    "IVF_PQ": {"refine_k": 8},
    "SCANN": {"reorder_k": 100},
    "IVF_RABITQ": {"refine_k": 8},
}


def gen_corpus(nb, nq, dim, n_clusters=500, intrinsic_dim=32, seed=0):
    """SIFT-like corpus (same generator as bench.py): gaussian mixture with
    LOW INTRINSIC DIMENSIONALITY. Full-rank iid gaussian clusters are a known
    pathological case for quantizers (distance concentration makes in-cluster
    ranking pure noise, so PQ/SQ recall plateaus regardless of search knobs)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 2.0
    W = rng.standard_normal((intrinsic_dim, dim)).astype(np.float32)
    W *= np.sqrt(dim / intrinsic_dim) / np.sqrt(intrinsic_dim)

    def noise(n):
        return rng.standard_normal((n, intrinsic_dim)).astype(np.float32) @ W

    xb = centers[rng.integers(0, n_clusters, size=nb)] + noise(nb)
    xq = centers[rng.integers(0, n_clusters, size=nq)] + noise(nq)
    return xb, xq


def load_dataset(nb, dim, nq, data_dir="data"):
    h5 = os.path.join(data_dir, "sift-128-euclidean.hdf5")
    if os.path.exists(h5):
        try:
            import h5py

            with h5py.File(h5, "r") as f:
                xb = np.asarray(f["train"], np.float32)[:nb]
                xq = np.asarray(f["test"], np.float32)[:nq]
                gt = np.asarray(f["neighbors"], np.int64)[:nq]
                return xb, xq, gt, "sift-128-euclidean"
        except Exception:
            pass
    xb, xq = gen_corpus(nb, nq, dim)
    return xb, xq, None, f"synthetic-mixture-{nb}x{dim}"


def recall_at_k(gt, ids, k):
    nq = ids.shape[0]
    hits = sum(len(set(gt[i, :k].tolist()) & set(ids[i, :k].tolist()) - {-1}) for i in range(nq))
    return hits / (nq * k)


class _BenchFileManager:
    """milvus::LocalFileManager stand-in for the DISKANN benchmark row
    (reference benches DISKANN through the same injected-FileManager path)."""

    def LoadFile(self, path):
        return True

    def AddFile(self, path):
        return os.path.exists(path)


def _build_diskann(xb, metric="L2"):
    import tempfile

    tmp = tempfile.mkdtemp(prefix="kt_diskann_bench_")
    data_path = os.path.join(tmp, "raw.bin")
    with open(data_path, "wb") as f:
        np.asarray(xb.shape, dtype=np.int32).tofile(f)
        xb.tofile(f)
    fm = _BenchFileManager()
    idx = kt.IndexFactory.Instance().Create("DISKANN", object=fm).value()
    prefix = os.path.join(tmp, "idx")
    t0 = time.perf_counter()
    st = idx.Build(
        kt.DataSet(),
        {
            "metric_type": metric,
            "index_prefix": prefix,
            "data_path": data_path,
            "max_degree": 48,
            "search_list_size": 128,
            "pq_code_budget_gb": 32 * xb.shape[0] / 1e9,
            "build_dram_budget_gb": 8.0,
        },
    )
    build_s = time.perf_counter() - t0
    if st != kt.Status.success:
        return None, build_s, st
    idx2 = kt.IndexFactory.Instance().Create("DISKANN", object=fm).value()
    st = idx2.Deserialize(
        kt.BinarySet(), {"metric_type": metric, "index_prefix": prefix}
    )
    return (idx2 if st == kt.Status.success else None), build_s, st


def bench_index(name, xb, xq, gt_ids, k, recall_target, nq_timed=8192, bitset=None, metric="L2"):
    base = kt.GenDataSetFromArray(xb)
    created = kt.IndexFactory.Instance().Create(name)
    if not created.has_value() and name != "DISKANN":
        return None
    if name == "DISKANN":
        idx, build_s, st = _build_diskann(xb, metric)
        if idx is None:
            return {"index": name, "error": st.name}
    else:
        idx = created.value()
        t0 = time.perf_counter()
        st = idx.Build(base, {"metric_type": metric, **BUILD_CFG.get(name, {})})
        build_s = time.perf_counter() - t0
        if st != kt.Status.success:
            return {"index": name, "error": st.name}

    knob, values = KNOBS[name]
    gt_nq = gt_ids.shape[0]
    q_gt = kt.GenDataSetFromArray(xq[:gt_nq])

    def search(knob_val, queries):
        cfg = {"metric_type": metric, "k": k, **SEARCH_EXTRA.get(name, {})}
        if knob:
            cfg[knob] = knob_val
        if bitset is not None:
            return idx.Search(queries, cfg, bitset)
        return idx.Search(queries, cfg)

    chosen, achieved = None, 0.0
    for v in values:
        r = search(v, q_gt)
        if not r.has_value():
            print(json.dumps({"index": name, "knob_value": v, "error": r.what()}), file=sys.stderr)
            continue
        rec = recall_at_k(gt_ids, r.value().ids.reshape(gt_nq, k), k)
        if rec >= recall_target:
            chosen, achieved = v, rec
            break
        chosen, achieved = v, rec  # keep best effort
    if chosen is None and knob is not None:
        return {"index": name, "error": "all knob values failed"}
    # timed runs on the full query set (warm)
    q_timed = kt.GenDataSetFromArray(xq[:nq_timed])
    search(chosen, q_timed)  # warm/compile
    t0 = time.perf_counter()
    r = search(chosen, q_timed)
    dt = time.perf_counter() - t0
    if not r.has_value():
        return {"index": name, "error": r.what()}
    return {
        "index": name,
        "knob": f"{knob}={chosen}" if knob else "exact",
        "recall": round(achieved, 4),
        "qps": round(min(nq_timed, xq.shape[0]) / dt, 1),
        "build_s": round(build_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--nq", type=int, default=10_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--recall", type=float, default=0.95)
    ap.add_argument("--gt-nq", type=int, default=1000)
    ap.add_argument("--index", type=str, default="IVF_FLAT,IVF_PQ,SCANN,HNSW")
    ap.add_argument(
        "--metric",
        type=str,
        default="L2",
        choices=["L2", "IP", "COSINE"],
        help="distance metric (reference: angular HDF5 datasets map to COSINE)",
    )
    ap.add_argument(
        "--filter",
        type=float,
        default=0.0,
        help="bitset filter ratio in [0,1): fraction of base rows filtered out "
        "(reference: benchmark/hdf5/benchmark_float_bitset.cpp sweeps the same)",
    )
    args = ap.parse_args()

    xb, xq, gt, ds_name = load_dataset(args.nb, args.dim, args.nq)
    if args.metric != "L2":
        gt = None  # HDF5 neighbors are euclidean; recompute under the chosen metric
    args.gt_nq = min(args.gt_nq, args.nq)
    bitset = None
    if args.filter > 0.0:
        rng = np.random.default_rng(12345)
        filtered_out = rng.random(xb.shape[0]) < args.filter
        bitset = kt.BitsetView.from_bool_array(filtered_out)
        gt = None  # HDF5 ground truth does not apply under a filter
    set_distance_precision(DistancePrecision.EXACT)
    if gt is None:
        g = kt.BruteForce.Search(
            kt.GenDataSetFromArray(xb),
            kt.GenDataSetFromArray(xq[: args.gt_nq]),
            {"metric_type": args.metric, "k": args.k},
            *( [bitset] if bitset is not None else [] ),
        )
        gt = g.value().ids.reshape(args.gt_nq, args.k)
    else:
        gt = gt[: args.gt_nq, : args.k]
    set_distance_precision(DistancePrecision.FAST)

    print(
        json.dumps(
            {
                "dataset": ds_name,
                "recall_target": args.recall,
                "k": args.k,
                "metric": args.metric,
                **({"filter_ratio": args.filter} if bitset is not None else {}),
            }
        )
    )
    for name in args.index.split(","):
        res = bench_index(name.strip(), xb, xq, gt, args.k, args.recall, bitset=bitset, metric=args.metric)
        if res:
            print(json.dumps(res))


if __name__ == "__main__":
    main()
