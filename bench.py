#!/usr/bin/env python
"""Headline benchmark — QPS at recall@10 >= 0.95 on SIFT1M-scale data.

Protocol parity with the reference harness
(reference: benchmark/hdf5/benchmark_float_qps.cpp:80-119): for the target
recall, binary-search the smallest search knob (nprobe for IVF; exact scan has
none) that reaches it, then report nq/elapsed.

Datasets: ann-benchmarks HDF5 files are not fetchable in this environment
(zero egress), so a SIFT1M-like synthetic corpus (1M x 128 fp32, clustered
gaussian mixture — matches SIFT's clusterability for IVF) is generated with a
fixed seed, and ground truth is computed with the EXACT fp32 path.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` compares against the north-star contract (BASELINE.md): 2x a
multicore AVX512 CPU running the same index family at the same recall —
vs_baseline >= 1.0 means the >=2x-CPU target is met.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import knowhere_tpu as kt  # noqa: E402
from knowhere_tpu.ops.distances import DistancePrecision, set_distance_precision  # noqa: E402

# Estimated multicore AVX512 CPU baseline for IVF-family search on SIFT1M at
# recall@10=0.95 (reference methodology, no published numbers in-repo; typical
# knowhere IVF_FLAT nlist=1024 full-host-pool throughput). North star = 2x this.
CPU_BASELINE_QPS = 15000.0
TARGET_QPS = 2.0 * CPU_BASELINE_QPS

NB = 1_000_000
DIM = 128
NQ = 10_000
K = 10
NLIST = 1024
RECALL_TARGET = 0.95


def gen_clustered(nb, dim, n_clusters=1000, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=nb)
    x = centers[assign] + rng.standard_normal((nb, dim)).astype(np.float32)
    return x


def recall_at_k(gt, ids, nq, k):
    hits = 0
    for i in range(nq):
        hits += len(set(gt[i, :k].tolist()) & set(ids[i, :k].tolist()) - {-1})
    return hits / (nq * k)


def main():
    xb = gen_clustered(NB, DIM, seed=0)
    rng = np.random.default_rng(1)
    xq = xb[rng.choice(NB, NQ, replace=False)] + 0.1 * rng.standard_normal((NQ, DIM)).astype(np.float32)

    base_ds = kt.GenDataSetFromArray(xb)
    query_ds = kt.GenDataSetFromArray(xq)

    # Ground truth with the exact path on a query subsample (GT cost control).
    gt_nq = 1000
    gt_queries = kt.GenDataSetFromArray(xq[:gt_nq])
    set_distance_precision(DistancePrecision.EXACT)
    gt_res = kt.BruteForce.Search(base_ds, gt_queries, {"metric_type": "L2", "k": K})
    gt_ids = gt_res.value().ids.reshape(gt_nq, K)

    # Flagship index: IVF_FLAT if registered, else FLAT exact scan.
    factory = kt.IndexFactory.Instance()
    use_ivf = factory.HasIndex("IVF_FLAT", "fp32")
    set_distance_precision(DistancePrecision.FAST)

    if use_ivf:
        idx = factory.Create("IVF_FLAT").value()
        t0 = time.perf_counter()
        st = idx.Build(base_ds, {"metric_type": "L2", "nlist": NLIST})
        build_s = time.perf_counter() - t0
        assert st == kt.Status.success, st
        index_name = "IVF_FLAT"

        # binary-search smallest nprobe reaching the recall target
        def recall_for(nprobe):
            r = idx.Search(gt_queries, {"metric_type": "L2", "k": K, "nprobe": nprobe})
            return recall_at_k(gt_ids, r.value().ids.reshape(gt_nq, K), gt_nq, K)

        lo, hi = 1, 256
        while lo < hi:
            mid = (lo + hi) // 2
            if recall_for(mid) >= RECALL_TARGET:
                hi = mid
            else:
                lo = mid + 1
        nprobe = lo
        search_cfg = {"metric_type": "L2", "k": K, "nprobe": nprobe}
        achieved = recall_for(nprobe)
    else:
        idx = factory.Create("FLAT").value()
        t0 = time.perf_counter()
        st = idx.Build(base_ds, {"metric_type": "L2"})
        build_s = time.perf_counter() - t0
        assert st == kt.Status.success, st
        index_name = "FLAT"
        search_cfg = {"metric_type": "L2", "k": K}
        nprobe = None
        r = idx.Search(gt_queries, search_cfg)
        achieved = recall_at_k(gt_ids, r.value().ids.reshape(gt_nq, K), gt_nq, K)

    # warmup (compile) then timed runs
    idx.Search(kt.GenDataSetFromArray(xq[:256]), search_cfg)
    t0 = time.perf_counter()
    res = idx.Search(query_ds, search_cfg)
    elapsed = time.perf_counter() - t0
    assert res.has_value(), res.what()
    qps = NQ / elapsed

    print(
        json.dumps(
            {
                "metric": f"QPS@recall10>={RECALL_TARGET} SIFT1M-like {index_name}"
                + (f" nprobe={nprobe}" if nprobe else ""),
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
