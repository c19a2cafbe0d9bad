import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from knowhere_tpu.ops.kmeans import kmeans, assign_rows
from knowhere_tpu.ops.ivf_scan import coarse_probe, ivf_scan_search
from knowhere_tpu.ops.ivf_pallas import LIST_ALIGN

rng = np.random.default_rng(0)
nb, d = 1_000_000, 128
nclu = 500
centers = rng.standard_normal((nclu, d)).astype(np.float32) * 2.0
W_ = rng.standard_normal((32, d)).astype(np.float32) * np.sqrt(d/32)/np.sqrt(32)
x = centers[rng.integers(0, nclu, nb)] + rng.standard_normal((nb, 32)).astype(np.float32) @ W_

t0=time.time()
nlist = 1000
sample = x[rng.choice(nb, 256*nlist, replace=False)]
cents, _ = kmeans(sample, nlist, n_iters=8)
print("kmeans(sample)", time.time()-t0, flush=True); t0=time.time()
assign = assign_rows(x, cents)
print("assign_full", time.time()-t0, flush=True); t0=time.time()

order = np.argsort(assign, kind="stable")
counts = np.bincount(assign, minlength=nlist).astype(np.int64)
pad_counts = (counts + LIST_ALIGN - 1)//LIST_ALIGN*LIST_ALIGN
offsets = np.zeros(nlist+1, np.int64); np.cumsum(pad_counts, out=offsets[1:])
nb_pad = int(offsets[-1])
true_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
dst = np.arange(nb, dtype=np.int64) + np.repeat(offsets[:-1]-true_starts, counts)
x_sorted = np.zeros((nb_pad, d), np.float32); x_sorted[dst] = x[order]
pad = np.zeros((2048, d), np.float32)
store = {
  "data": jax.device_put(np.concatenate([x_sorted, pad])),
  "norms": jax.device_put(np.concatenate([np.sum(x_sorted.astype(np.float64)**2,1).astype(np.float32), np.zeros(2048, np.float32)])),
  "centroids": jax.device_put(cents),
}
store["data"].block_until_ready()
print("layout+h2d", time.time()-t0, "nb_pad", nb_pad, flush=True); t0=time.time()

for trial in range(3):
    s0 = trial*16384
    q_dev = jax.device_put(x[s0:s0+16384])
    t0=time.time()
    probes = np.asarray(coarse_probe(q_dev, store["centroids"], nprobe=12, is_l2=True))
    t1=time.time()
    _, pos = ivf_scan_search(q_dev, store, "raw", probes, offsets, 51, True, list_lengths=counts)
    t2=time.time()
    print(f"chunk{trial}: probe {t1-t0:.2f}s scan {t2-t1:.2f}s", flush=True)
