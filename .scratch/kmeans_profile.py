import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from knowhere_tpu.ops.kmeans import _lloyd_step, _assign_block

rng = np.random.default_rng(0)
x = rng.standard_normal((256000, 128)).astype(np.float32)
c0 = x[:1000].copy()

t0=time.time(); xd = jax.device_put(x); xd.block_until_ready()
print(f"h2d 131MB: {time.time()-t0:.2f}s", flush=True)
t0=time.time(); cd = jax.device_put(c0); cd.block_until_ready()
print(f"h2d 0.5MB: {time.time()-t0:.3f}s", flush=True)

t0=time.time()
cents, counts = _lloyd_step(xd, cd, k=1000)
counts.block_until_ready()
print(f"lloyd step 1 (compile+run): {time.time()-t0:.2f}s", flush=True)
for i in range(3):
    t0=time.time()
    cents, counts = _lloyd_step(xd, cents, k=1000)
    np.asarray(counts)
    print(f"lloyd step warm: {time.time()-t0:.3f}s", flush=True)

t0=time.time()
a = _assign_block(xd[:131072], cents); a.block_until_ready()
print(f"assign block 131072 (compile+run): {time.time()-t0:.2f}s", flush=True)
t0=time.time()
a = _assign_block(xd[:131072], cents); a.block_until_ready()
print(f"assign block warm: {time.time()-t0:.3f}s", flush=True)

# h2d bandwidth big buffer
big = np.zeros((1_250_000, 128), np.float32)
t0=time.time(); bd = jax.device_put(big); bd.block_until_ready()
print(f"h2d 640MB: {time.time()-t0:.2f}s", flush=True)
