#!/usr/bin/env python
"""On-chip A/B of the HNSW search paths through the PUBLIC library API:
  (a) inline walk, 8-bit codes (current default)
  (b) inline walk, 4-bit codes (KNOWHERE_INLINE_BITS=4)
  (c) general (narrow-gather) walk with the variadic-sort merge

One build; the inline table is derived data so (b)/(c) only re-derive it.
Methodology matches benchmark/suite.py (linear sweep over the reference ef
ladder, first value reaching the recall target, then QPS on 8192 warm
queries). Reference protocol: benchmark/hdf5/benchmark_float_qps.cpp:80-119.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import knowhere_tpu as kt  # noqa: E402
from knowhere_tpu.ops.distances import DistancePrecision, set_distance_precision  # noqa: E402
from benchmark.suite import gen_corpus, recall_at_k  # noqa: E402

NB, DIM, NQ, GT_NQ, K, TARGET = 1_000_000, 128, 8192, 1000, 10, 0.95
EFS = [16, 20, 24, 28, 32, 48, 64, 96, 128, 256, 512]


def sweep(idx, xq, gt, tag):
    q_gt = kt.GenDataSetFromArray(xq[:GT_NQ])
    chosen, achieved = None, 0.0
    for ef in EFS:
        r = idx.Search(q_gt, {"metric_type": "L2", "k": K, "ef": ef})
        if not r.has_value():
            print(json.dumps({"tag": tag, "ef": ef, "error": r.what()}))
            continue
        rec = recall_at_k(gt, r.value().ids.reshape(GT_NQ, K), K)
        chosen, achieved = ef, rec
        if rec >= TARGET:
            break
    if chosen is None:
        print(json.dumps({"tag": tag, "error": "all ef values in sweep failed"}),
              flush=True)
        return
    q_t = kt.GenDataSetFromArray(xq)
    idx.Search(q_t, {"metric_type": "L2", "k": K, "ef": chosen})  # warm
    t0 = time.perf_counter()
    r = idx.Search(q_t, {"metric_type": "L2", "k": K, "ef": chosen})
    dt = time.perf_counter() - t0
    if not r.has_value():
        print(json.dumps({"tag": tag, "ef": chosen, "error": r.what()}), flush=True)
        return
    print(json.dumps({
        "tag": tag, "ef": chosen, "recall": round(achieved, 4),
        "qps": round(NQ / dt, 1),
    }), flush=True)


def main():
    xb, xq = gen_corpus(NB, NQ, DIM)
    set_distance_precision(DistancePrecision.EXACT)
    gt = (
        kt.BruteForce.Search(
            kt.GenDataSetFromArray(xb), kt.GenDataSetFromArray(xq[:GT_NQ]),
            {"metric_type": "L2", "k": K},
        ).value().ids.reshape(GT_NQ, K)
    )
    set_distance_precision(DistancePrecision.FAST)

    idx = kt.IndexFactory.Instance().Create("HNSW").value()
    t0 = time.perf_counter()
    st = idx.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2", "M": 16, "efConstruction": 200})
    print(json.dumps({"build_s": round(time.perf_counter() - t0, 1), "status": st.name}), flush=True)
    node = idx.node if hasattr(idx, "node") else idx._node

    def expect_inline(bits):
        # hnsw.py:_refresh_inline swallows make_inline_store failures and
        # silently falls back to the general walk; a mislabeled row would
        # corrupt the 4-bit decision this A/B exists to settle.
        if bits is None:
            assert node._inline is None, "expected general walk, inline store active"
        else:
            assert node._inline is not None, (
                f"inline store failed to build (wanted {bits}-bit); "
                "row would silently measure the general walk"
            )
            assert node._inline.bits == bits, (
                f"inline store has bits={node._inline.bits}, wanted {bits}"
            )

    expect_inline(8)
    sweep(idx, xq, gt, "inline8")

    os.environ["KNOWHERE_INLINE_BITS"] = "4"
    node._refresh_inline()
    expect_inline(4)
    sweep(idx, xq, gt, "inline4")

    os.environ["KNOWHERE_GRAPH_INLINE"] = "0"
    node._refresh_inline()
    expect_inline(None)
    sweep(idx, xq, gt, "general")


if __name__ == "__main__":
    main()
