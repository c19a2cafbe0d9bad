#!/usr/bin/env python
"""Micro-profile of the inline-walk kernel (ops/graph_inline.beam_search_inline).

Synthetic 1M-row table + random graph: measures PER-STEP wall cost of the walk
for candidate (W, bits) configurations by differencing two n_steps settings
(fixed-trip loops; random neighbors keep every beam busy, so the done-flag
never fires and the delta isolates one step). Also times the component ops
(wide-row gather, decode+score einsum, variadic sort merge) standalone.

Recall is NOT measured here (random graph) — use benchmark/hnsw_inline_ab.py
for the recall side of the decision. Reference protocol analog: the
per-kernel microbenches under benchmark/ (SURVEY.md §6).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from knowhere_tpu.ops import graph_inline as GI

NB, D, DEG, NQ = 1_000_000, 128, 32, 10_240
K = 10


def _sync(r):
    """Force a REAL device->host sync: on the axon relay block_until_ready
    returns before execution finishes (measured >HBM-speed-of-light rates),
    so read back one element instead. Costs the flat ~30ms tunnel tax, which
    the n_steps differencing cancels."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timed(fn, *a, warm=1, reps=3, **kw):
    for _ in range(warm):
        r = fn(*a, **kw)
    _sync(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*a, **kw)
        _sync(r)
        best = min(best, time.perf_counter() - t0)
    return best, r


def measure_tax():
    """Flat per-sync overhead (tunnel round-trip + dispatch) to subtract
    from component timings."""
    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(np.zeros((8, 8), np.float32))
    t, _ = timed(f, x, warm=2, reps=5)
    return t


def main():
    rng = np.random.default_rng(0)
    xb = rng.standard_normal((NB, D)).astype(np.float32)
    graph = rng.integers(0, NB, size=(NB, DEG)).astype(np.int32)
    q = jax.device_put(rng.standard_normal((NQ, D)).astype(np.float32))
    data = jax.device_put(xb)
    tax = measure_tax()
    print(json.dumps({"comp": "sync_tax", "ms": round(tax * 1e3, 3)}), flush=True)
    norms = jnp.sum(data * data, axis=1)
    vmin = jnp.min(data, axis=0)
    vdiff = jnp.maximum(jnp.max(data, axis=0) - vmin, 1e-20)
    n_ent = 256
    entry = jax.device_put(rng.integers(0, NB, size=n_ent).astype(np.int32))
    cents = data[:n_ent]

    for bits in (8, 4):
        levels = float(1 << bits)
        codes_int = jnp.clip(
            jnp.floor((data - vmin[None]) / vdiff[None] * levels), 0, levels - 1
        ).astype(jnp.int32)
        codes_w = (
            GI.sq8_pack_words(codes_int.astype(jnp.uint8))
            if bits == 8
            else GI.sq4_pack_words(codes_int)
        )
        table = GI.build_inline_table(graph, codes_w, norms)
        row_kb = table.shape[1] * 4 / 1024

        # component: wide-row gather of (NQ, W) rows
        for W in (2, 3, 4, 8):
            ids = jax.device_put(
                rng.integers(0, NB, size=(NQ, W)).astype(np.int32)
            )
            g = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
            dt, _ = timed(g, table, ids)
            dt = max(dt - tax, 1e-6)
            print(json.dumps({
                "comp": "gather", "bits": bits, "W": W,
                "ms": round(dt * 1e3, 3),
                "mrows_s": round(NQ * W / dt / 1e6, 1),
                "gb_s": round(NQ * W * row_kb / 1024 / 1024 / dt, 1),
            }), flush=True)

        # full walk: per-step cost via n_steps differencing
        for W, ef in ((3, 24), (2, 24), (4, 24), (8, 24), (4, 32), (8, 64)):
            ring = max(1, 256 // (W * DEG))
            base = dict(
                W=W, ef=ef, deg=DEG, ring_slots=ring, n_seed=8, k=K,
                is_l2=True, has_mask=False, rerank_kind="raw", bits=bits,
            )

            def run(n_steps):
                return GI.beam_search_inline(
                    table, q, data, None, None, entry, cents, vmin, vdiff,
                    None, n_steps=n_steps, **base,
                )

            lo, hi = ef // W + 6, 2 * (ef // W + 6)
            t_lo, _ = timed(run, lo)
            t_hi, _ = timed(run, hi)
            per_step = (t_hi - t_lo) / (hi - lo)
            t_eff = max(t_lo - tax, 1e-6)
            print(json.dumps({
                "comp": "walk", "bits": bits, "W": W, "ef": ef,
                "steps": lo, "total_ms": round(t_eff * 1e3, 2),
                "per_step_ms": round(per_step * 1e3, 3),
                "fixed_ms": round((t_eff - per_step * lo) * 1e3, 2),
                "qps_proj": round(NQ / t_eff, 0),
            }), flush=True)
        table.delete()


if __name__ == "__main__":
    main()
