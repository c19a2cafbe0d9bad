import os, sys, time
os.environ["KNOWHERE_BUILD_TIMING"] = "1"
sys.path.insert(0, "/root/repo")
import numpy as np
from knowhere_tpu.ops.graph import build_graph, pick_entry_points

rng = np.random.default_rng(0)
nb, d = 1_000_000, 128
nclu = 500
centers = rng.standard_normal((nclu, d)).astype(np.float32) * 2.0
W_ = rng.standard_normal((32, d)).astype(np.float32) * np.sqrt(d/32)/np.sqrt(32)
xb = centers[rng.integers(0, nclu, nb)] + rng.standard_normal((nb, 32)).astype(np.float32) @ W_

t0 = time.time()
g = build_graph(xb, 32, "L2", intermediate_deg=50)
print("build_graph total", time.time()-t0, flush=True)
t0 = time.time()
e = pick_entry_points(xb, n_entry=64)
print("entries", time.time()-t0, flush=True)
