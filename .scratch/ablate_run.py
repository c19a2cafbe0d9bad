"""Ablation timing of the beam-search step on a 200k corpus, real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/.scratch")
import numpy as np, jax
import graph_ablate as G
from knowhere_tpu.ops.graph import build_graph, pick_entry_points

rng = np.random.default_rng(0)
nb, d = 200_000, 128
# clustered corpus like the bench
nclu = 200
centers = rng.standard_normal((nclu, d)).astype(np.float32) * 2.0
W_ = rng.standard_normal((32, d)).astype(np.float32) * np.sqrt(d/32)/np.sqrt(32)
xb = centers[rng.integers(0, nclu, nb)] + rng.standard_normal((nb, 32)).astype(np.float32) @ W_
xq = centers[rng.integers(0, nclu, 8192)] + rng.standard_normal((8192, 32)).astype(np.float32) @ W_

import os
t0 = time.time()
CACHE = "/root/repo/.scratch/ablate_graph_cache.npz"
if os.path.exists(CACHE):
    z = np.load(CACHE)
    graph, entry = z["graph"], z["entry"]
else:
    graph = build_graph(xb, 32, "L2", intermediate_deg=64)
    entry = pick_entry_points(xb, n_entry=64)
    np.savez(CACHE, graph=graph, entry=entry)
LOG = open("/root/repo/.scratch/ablate_results.txt", "a", buffering=1)
def logp(msg):
    print(msg, flush=True); LOG.write(msg + "\n")
logp(f"graph built {time.time()-t0:.0f}s")

store = {"data": jax.device_put(xb)}
graph_dev = jax.device_put(graph)
entry_dev = jax.device_put(entry.astype(np.int32))
q_dev = jax.device_put(xq)

# exact gt on a subset for recall (matmul form — the broadcast form
# materializes (256, nb, d) = 52GB and thrashes the host)
qs = xq[:256].astype(np.float64)
d2 = (qs**2).sum(1)[:,None] + (xb.astype(np.float64)**2).sum(1)[None,:] - 2.0 * qs @ xb.astype(np.float64).T
gt = np.argsort(d2,1)[:, :10]

def run(ablate, ef=32, W=2):
    kw = dict(kind="raw", ef=ef, k=10, deg=32, max_iters=2*ef//W+32, is_l2=True,
              prec="fast", beam_width=W, ablate=ablate)
    s, ids = G.beam_search(q_dev, store, graph_dev, entry_dev, None, **kw)
    ids.block_until_ready()  # compile+warm
    t0 = time.time()
    for _ in range(3):
        s, ids = G.beam_search(q_dev, store, graph_dev, entry_dev, None, **kw)
    ids.block_until_ready()
    dt = (time.time()-t0)/3
    idsh = np.asarray(ids)[:256]
    rec = np.mean([len(set(gt[i])&set(idsh[i].tolist()))/10 for i in range(256)])
    logp(f"{ablate or 'baseline':28s} ef={ef} W={W}  {8192/dt:8.0f} qps  recall={rec:.4f}")

for ab in ["", "nores,noinbeam,nodedup", "nores", "noinbeam", "nodedup"]:
    try:
        run(ab)
    except Exception as e:
        logp(f"{ab}: FAILED {e}")
