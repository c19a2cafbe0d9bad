#!/usr/bin/env python
"""Stage-by-stage profile of the fused IVF_FLAT search at bench scale.

The r3 verdict assumed the 1M x 128 nprobe=16 search (23.6k QPS) was
MXU-bound, but the matmul roofline for 15.6k scanned rows/query is ~0.3ms
per 10k-query batch on v5e — 3 orders below the measured 434ms. This script
times each fused-search stage separately on the real chip to find where the
batch time actually goes:

  1. coarse_probe          (nq x nlist matmul + lax.top_k(nprobe))
  2. build_scan_tasks_jax  (device task inversion: argsort + cumsums)
  3. q_task gather         (per-task query-group gather)
  4. pallas scan kernel    (the task matmul + in-kernel top-kk)
  5. _merge_tasks          (scatter + final lax.top_k)

Usage: python benchmark/profile_ivf_stages.py [nb] [nq] [nprobe]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bench  # corpus + cache helpers
import knowhere_tpu as kt
from knowhere_tpu.ops import ivf_scan as S
from knowhere_tpu.ops import ivf_pallas as P

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
NPROBE = int(sys.argv[3]) if len(sys.argv) > 3 else 16
K = 10
NLIST = 1024


def timed(label, fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:28s} {dt*1e3:9.2f} ms")
    return out, dt


def main():
    def gen():
        xb, xq = bench.gen_corpus(NB, NQ, 128)
        return np.concatenate([xq, xb], 0)

    both = bench.cached_npy(f"sift_{NB}x128_{NQ}", gen)
    xq, xb = np.ascontiguousarray(both[:NQ]), np.ascontiguousarray(both[NQ:])

    idx, meta = bench.load_index_cache(f"sift_IVF_FLAT_{NB}", "IVF_FLAT",
                                       {"metric_type": "L2", "nlist": NLIST})
    if idx is None:
        idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
        t0 = time.perf_counter()
        idx.Train(kt.GenDataSetFromArray(xb), {"metric_type": "L2", "nlist": NLIST})
        idx.Add(kt.GenDataSetFromArray(xb), {"metric_type": "L2", "nlist": NLIST})
        meta = {"build_s": round(time.perf_counter() - t0, 1)}
        bench.save_index_cache(f"sift_IVF_FLAT_{NB}", idx, meta)
    print("build:", meta)

    node = idx.node
    q_ds = kt.GenDataSetFromArray(xq)

    # end-to-end through the public API first
    r = idx.Search(q_ds, {"metric_type": "L2", "k": K, "nprobe": NPROBE})
    assert r.has_value(), r.what()
    t0 = time.perf_counter()
    r = idx.Search(q_ds, {"metric_type": "L2", "k": K, "nprobe": NPROBE})
    e2e = time.perf_counter() - t0
    print(f"{'END-TO-END Search':28s} {e2e*1e3:9.2f} ms   ({NQ/e2e:.0f} QPS)")

    # --- stages ---
    store = node._store
    offsets, lens = node._offsets, node._lengths
    lens_arr = np.asarray(lens, np.int64)
    q_pad = node._pad_q_host(node._prep_rows(xq))
    q_dev = jax.device_put(q_pad)
    jax.block_until_ready(q_dev)
    nq_pad = q_pad.shape[0]
    d_dev = q_pad.shape[1]

    probes, _ = timed(
        "coarse_probe",
        lambda: S.coarse_probe(q_dev, store["centroids"], nprobe=NPROBE, is_l2=True),
    )

    B = P.LIST_ALIGN
    Qg = 128
    d_chunk = d_dev
    chunk = max(8, min(16384, (512 << 20) // max(Qg * d_chunk * 4, 1)) // 8 * 8)
    T_max, G_max, S_max = S.device_task_bounds(nq_pad, NPROBE, lens_arr, B, Qg)
    print(f"{'T_max/G_max/S_max':28s} {T_max}/{G_max}/{S_max}  chunk={chunk}")
    off_dev, lens_dev = S._store_geom(store, offsets, lens_arr)
    Tc = (min(chunk, T_max) + 7) // 8 * 8
    n_chunks = (T_max + Tc - 1) // Tc
    total = n_chunks * Tc

    tasks, _ = timed(
        "build_scan_tasks_jax",
        lambda: S.build_scan_tasks_jax(
            probes, off_dev, lens_dev, B=B, Qg=Qg, T_max=total, G_max=G_max,
            nlist=NLIST,
        ),
    )
    rs_dev, nrows_dev, lid_dev, qids_t, slots_t = tasks
    blk_dev = rs_dev // B
    kk = P.task_kk(K, B)

    qt, _ = timed(
        "q_task gather",
        jax.jit(lambda q, qi: jnp.take(q, jnp.clip(qi, 0), axis=0)),
        q_dev, qids_t,
    )

    scan, _ = timed(
        "pallas scan kernel",
        lambda: P.pallas_scan_tasks(
            blk_dev, nrows_dev, qt, store["data"], None,
            B=B, Qg=Qg, kk=kk, is_l2=True, three_pass=True,
        ),
    )
    _, dt1 = timed(
        "pallas scan single-pass",
        lambda: P.pallas_scan_tasks(
            blk_dev, nrows_dev, qt, store["data"], None,
            B=B, Qg=Qg, kk=kk, is_l2=True, three_pass=False,
        ),
    )
    sc, pos = scan

    Spad = S._pad_pow2(S_max, minimum=1)
    merged, _ = timed(
        "_merge_tasks",
        lambda: S._merge_tasks(sc, pos, qids_t, slots_t, nq=nq_pad, S=Spad,
                               kk=kk, k=K),
    )
    # same merge on canonical-layout copies: isolates pallas-output-layout
    # conversion cost from the merge itself
    sc2 = jax.block_until_ready(jnp.asarray(np.asarray(sc)))
    pos2 = jax.block_until_ready(jnp.asarray(np.asarray(pos)))
    timed(
        "_merge_tasks canon",
        lambda: S._merge_tasks(sc2, pos2, qids_t, slots_t, nq=nq_pad, S=Spad,
                               kk=kk, k=K),
    )
    # and the k=48 candidate-pool merge the int8 path performs
    timed(
        "_merge_tasks k=48",
        lambda: S._merge_tasks(sc, pos, qids_t, slots_t, nq=nq_pad, S=Spad,
                               kk=kk, k=48),
    )

    # bisect the merge with the REAL arrays
    from functools import partial as _pt

    @_pt(jax.jit, static_argnames=("nq", "S", "kk"))
    def scatter_only(scores, pos, qids, slots, *, nq, S, kk):
        flat_idx = jnp.where(qids >= 0, qids * S + jnp.minimum(slots, S - 1), nq * S)
        ms = jnp.full((nq * S + 1, kk), -jnp.inf, jnp.float32).at[flat_idx.reshape(-1)].set(scores.reshape(-1, kk))
        mp = jnp.full((nq * S + 1, kk), -1, jnp.int32).at[flat_idx.reshape(-1)].set(pos.reshape(-1, kk))
        return ms, mp

    (ms_r, mp_r), _ = timed(
        "merge.scatter real", scatter_only, sc, pos, qids_t, slots_t,
        nq=nq_pad, S=Spad, kk=kk,
    )
    msv = jax.block_until_ready(ms_r[: nq_pad * Spad].reshape(nq_pad, Spad * kk) + 0)
    mpv = jax.block_until_ready(mp_r[: nq_pad * Spad].reshape(nq_pad, Spad * kk) + 0)

    @_pt(jax.jit, static_argnames=("k",))
    def topk_only(ms, mp, *, k):
        s, sel = jax.lax.top_k(ms, k)
        return s, jnp.take_along_axis(mp, sel, axis=1)

    timed("merge.topk real k=10", topk_only, msv, mpv, k=K)
    timed("merge.topk real k=48", topk_only, msv, mpv, k=48)

    # decisive: same scatter, same process, SYNTHETIC data values
    rngp = np.random.default_rng(1)
    T_syn = sc.shape[0]
    sc_s = jax.device_put(rngp.standard_normal((T_syn, Qg, kk)).astype(np.float32))
    pos_s = jax.device_put(rngp.integers(0, 1 << 20, (T_syn, Qg, kk)).astype(np.int32))
    qid_s = jax.device_put(rngp.integers(0, nq_pad, (T_syn, Qg)).astype(np.int32))
    slot_s = jax.device_put(rngp.integers(0, S_max, (T_syn, Qg)).astype(np.int32))
    jax.block_until_ready((sc_s, pos_s, qid_s, slot_s))
    timed(
        "merge.scatter synth", scatter_only, sc_s, pos_s, qid_s, slot_s,
        nq=nq_pad, S=Spad, kk=kk,
    )

    @jax.jit
    def fulls_only():
        a = jnp.full((nq_pad * Spad + 1, kk), -jnp.inf, jnp.float32)
        b = jnp.full((nq_pad * Spad + 1, kk), -1, jnp.int32)
        return a[0], b[0]

    timed("merge.fulls only", fulls_only)

    # useful counts
    pr = np.asarray(probes)
    pairs = int((pr >= 0).sum())
    print(f"pairs={pairs} tasks<= {total} Qg={Qg} B={B} kk={kk} S={Spad}")


if __name__ == "__main__":
    main()
