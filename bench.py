#!/usr/bin/env python
"""Headline benchmark — IVF_FLAT QPS at recall@10 >= 0.95 on SIFT1M-scale data.

Protocol parity with the reference harness
(reference: benchmark/hdf5/benchmark_float_qps.cpp:80-119): binary-search the
smallest nprobe whose recall@10 reaches the target, then report nq/elapsed.
IVF_FLAT nlist=1024 is one of the reference's headline benchmark rows
(benchmark/hdf5/ref_logs/Makefile); target >= 2x a multicore AVX512 CPU.
benchmark/suite.py covers the other families (IVF_PQ/SCANN/HNSW/...).

Datasets: ann-benchmarks HDF5 is not fetchable here (zero egress); a
SIFT1M-like corpus (1M x 128 fp32, gaussian mixture with overlapping
clusters; queries drawn FRESH from the mixture, not perturbed base rows) is
generated with fixed seeds, ground truth computed with the EXACT fp32 path.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline >= 1.0 means the >=2x-CPU north-star target is met
(CPU baseline estimate: 15k QPS for knowhere IVF-family search at
recall@10=0.95 on SIFT1M with all host cores).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402


def _probe_backend(
    timeout_s: float = float(os.environ.get("KNOWHERE_BENCH_PROBE_TIMEOUT", "300")),
):
    """Fail fast (one JSON error line) instead of hanging forever when the
    axon relay is down — jax.devices() otherwise blocks in the claim loop."""
    import threading

    out = {}

    def probe():
        try:
            out["devices"] = jax.devices()
        except Exception as e:  # pragma: no cover
            out["error"] = str(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive() or "error" in out:
        print(
            json.dumps(
                {
                    "metric": "ivf_flat_qps_at_recall10_0.95_sift1m",
                    "value": 0.0,
                    "unit": "qps",
                    "vs_baseline": 0.0,
                    "error": out.get(
                        "error", f"TPU backend unreachable after {timeout_s:.0f}s"
                    ),
                },
            ),
            flush=True,
        )
        os._exit(1)
    return out["devices"]


_probe_backend()

# persistent compile cache: kernel shapes recompile only once across rounds
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import knowhere_tpu as kt  # noqa: E402
from knowhere_tpu.ops.distances import DistancePrecision, set_distance_precision  # noqa: E402

CPU_BASELINE_QPS = 15000.0
TARGET_QPS = 2.0 * CPU_BASELINE_QPS

NB = 1_000_000
DIM = 128
NQ = 10_000
K = 10
NLIST = 1024
RECALL_TARGET = 0.95
GT_NQ = 1000


def gen_corpus(nb, nq, dim, n_clusters=500, intrinsic_dim=32, seed=0):
    """SIFT-like corpus: gaussian mixture with LOW INTRINSIC DIMENSIONALITY
    (SIFT's is ~16-30; full-rank iid gaussian is a known pathological case
    for quantizers due to distance concentration). Queries are fresh draws
    from the same mixture, never perturbed base rows."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 2.0
    W = rng.standard_normal((intrinsic_dim, dim)).astype(np.float32)
    W *= np.sqrt(dim / intrinsic_dim) / np.sqrt(intrinsic_dim)

    def noise(n):
        return rng.standard_normal((n, intrinsic_dim)).astype(np.float32) @ W

    xb = centers[rng.integers(0, n_clusters, size=nb)] + noise(nb)
    xq = centers[rng.integers(0, n_clusters, size=nq)] + noise(nq)
    return xb, xq


def recall_at_k(gt, ids, nq, k):
    hits = sum(len(set(gt[i].tolist()) & set(ids[i].tolist()) - {-1}) for i in range(nq))
    return hits / (nq * k)


def main():
    xb, xq = gen_corpus(NB, NQ, DIM)
    base_ds = kt.GenDataSetFromArray(xb)
    query_ds = kt.GenDataSetFromArray(xq)
    gt_queries = kt.GenDataSetFromArray(xq[:GT_NQ])

    set_distance_precision(DistancePrecision.EXACT)
    gt_res = kt.BruteForce.Search(base_ds, gt_queries, {"metric_type": "L2", "k": K})
    gt_ids = gt_res.value().ids.reshape(GT_NQ, K)

    set_distance_precision(DistancePrecision.FAST)
    idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
    t0 = time.perf_counter()
    st = idx.Build(base_ds, {"metric_type": "L2", "nlist": NLIST})
    build_s = time.perf_counter() - t0
    assert st == kt.Status.success, st

    def search(nprobe, queries):
        return idx.Search(
            queries, {"metric_type": "L2", "k": K, "nprobe": nprobe}
        )

    def recall_for(nprobe):
        r = search(nprobe, gt_queries)
        return recall_at_k(gt_ids, r.value().ids.reshape(GT_NQ, K), GT_NQ, K)

    # binary-search smallest nprobe reaching the target (reference protocol)
    lo, hi = 1, min(256, NLIST)
    if recall_for(hi) < RECALL_TARGET:
        nprobe = hi
    else:
        while lo < hi:
            mid = (lo + hi) // 2
            if recall_for(mid) >= RECALL_TARGET:
                hi = mid
            else:
                lo = mid + 1
        nprobe = lo
    achieved = recall_for(nprobe)

    search(nprobe, query_ds)  # warm / compile
    elapsed = float("inf")
    for _ in range(3):  # best-of-3: axon tunnel latency varies run to run
        t0 = time.perf_counter()
        res = search(nprobe, query_ds)
        elapsed = min(elapsed, time.perf_counter() - t0)
    assert res.has_value(), res.what()
    qps = NQ / elapsed

    print(
        json.dumps(
            {
                "metric": f"IVF_FLAT(nlist=1024) QPS@recall10>={RECALL_TARGET} SIFT1M-like, nprobe={nprobe}",
                "value": round(qps, 1),
                "unit": "QPS/chip",
                "vs_baseline": round(qps / TARGET_QPS, 3),
                "recall": round(achieved, 4),
                "build_s": round(build_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
