#!/usr/bin/env python
"""Mosaic spot-checks for the round-4 kernels on the real chip.

Each check compiles + executes one new kernel at production-like (small)
shapes and asserts against a numpy oracle. On failure it prints the kernel
and keeps going — gate the failing shape in pallas_*_available /
adc_mc_geometry rather than reverting the kernel.
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from knowhere_tpu.ops.ivf_pallas import (
    LIST_ALIGN,
    adc_mc_geometry,
    adc_s_stack,
    pallas_adc_tasks,
    pallas_adc_tasks_mc,
    pallas_int8_tasks,
)
from knowhere_tpu.ops.ivf_scan import quantize_queries_int8

print(jax.devices())
results = {}


def check(name):
    def deco(fn):
        try:
            fn()
            results[name] = "OK"
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL {type(e).__name__}: {str(e)[:200]}"
            traceback.print_exc(limit=3)
        print(f"[{name}] {results[name]}", flush=True)

    return deco


B = LIST_ALIGN
rng = np.random.default_rng(0)


@check("int8_i8_codes")
def _():
    d, Qg, kk, Tc = 128, 64, 16, 8
    nb = Tc * B
    x = rng.standard_normal((nb, d)).astype(np.float32)
    q = rng.standard_normal((Qg, d)).astype(np.float32)
    mu = x.mean(0)
    s = np.maximum(np.abs(x - mu).max(0) / 127.0, 1e-12).astype(np.float32)
    ci = np.clip(np.rint((x - mu) / s), -127, 127).astype(np.int8)
    nrm = np.sum((x - mu).astype(np.float64) ** 2, 1).astype(np.float32)
    zi, sz = quantize_queries_int8(jax.device_put(q), jax.device_put(mu.astype(np.float32)), jax.device_put(s))
    scores, pos = pallas_int8_tasks(
        jnp.arange(Tc, dtype=jnp.int32), jnp.full((Tc,), B, jnp.int32),
        jnp.broadcast_to(zi, (Tc, Qg, d)),
        jnp.broadcast_to(sz[:, None], (Tc, Qg, 1)),
        jax.device_put(ci), jax.device_put(nrm.reshape(Tc, 1, B)),
        B=B, Qg=Qg, kk=kk, is_l2=True,
    )
    est = 2.0 * np.asarray(sz)[:, None] * (
        np.asarray(zi).astype(np.int32) @ ci.astype(np.int32).T
    ) - nrm[None, :]
    for t in range(Tc):
        want = np.sort(est[:, t * B : (t + 1) * B], 1)[:, ::-1][:, :kk]
        np.testing.assert_allclose(np.asarray(scores)[t], want, rtol=1e-5, atol=1e-2)


@check("int8_u8_codes_xor")
def _():
    d, Qg, kk, Tc = 128, 64, 8, 4
    nb = Tc * B
    codes_u8 = rng.integers(0, 256, (nb, d)).astype(np.uint8)
    ci = (codes_u8.astype(np.int16) - 128).astype(np.int8)
    nrm = rng.uniform(1, 2, nb).astype(np.float32)
    zi = rng.integers(-127, 128, (Qg, d)).astype(np.int8)
    sz = rng.uniform(0.01, 0.1, Qg).astype(np.float32)
    args = (
        jnp.arange(Tc, dtype=jnp.int32), jnp.full((Tc,), B, jnp.int32),
        jnp.broadcast_to(jnp.asarray(zi), (Tc, Qg, d)),
        jnp.broadcast_to(jnp.asarray(sz)[:, None], (Tc, Qg, 1)),
    )
    nbb = jax.device_put(nrm.reshape(Tc, 1, B))
    s_u8, p_u8 = pallas_int8_tasks(*args, jax.device_put(codes_u8), nbb,
                                   B=B, Qg=Qg, kk=kk, is_l2=True)
    s_i8, p_i8 = pallas_int8_tasks(*args, jax.device_put(ci), nbb,
                                   B=B, Qg=Qg, kk=kk, is_l2=True)
    np.testing.assert_array_equal(np.asarray(s_u8), np.asarray(s_i8))


def _adc_setup(m, ksub, d, nlist, dim=None, nq=32):
    """dim < d models feature padding (GIST 960 -> d_dev 1024): books cover
    dim, device arrays are zero-padded to d."""
    dim = dim or d
    sub = dim // m
    nb = nlist * B
    books = rng.standard_normal((m, ksub, sub)).astype(np.float32) * 0.3
    cents = np.zeros((nlist, d), np.float32)
    cents[:, :dim] = rng.standard_normal((nlist, dim)).astype(np.float32)
    codes = rng.integers(0, ksub, size=(nb, m)).astype(np.uint8)
    q = np.zeros((nq, d), np.float32)
    q[:, :dim] = rng.standard_normal((nq, dim)).astype(np.float32)
    books_bd = np.zeros((d, m * ksub), np.float32)
    for i in range(m):
        books_bd[i * sub : (i + 1) * sub, i * ksub : (i + 1) * ksub] = books[i].T
    c3 = cents[:, :dim].reshape(nlist, m, sub)
    clut = 2.0 * np.einsum("lms,mvs->lmv", c3, books) + np.sum(books**2, -1)[None]
    dec = books.reshape(m * ksub, sub)[
        codes.astype(np.int64) + (np.arange(m) * ksub)[None, :]
    ].reshape(nb, dim)
    x = np.zeros((nb, d), np.float32)
    x[:, :dim] = dec
    x += cents[np.repeat(np.arange(nlist), B)]
    gt = 2.0 * q @ x.T - np.sum(x**2, 1)[None, :]
    return books_bd, clut, cents, codes, q, gt


@check("adc_u8_codes_t")
def _():
    m, ksub, d, nlist, Qg, kk = 16, 256, 128, 4, 32, 8
    books_bd, clut, cents, codes, q, gt = _adc_setup(m, ksub, d, nlist)
    m_pad = (m + 31) // 32 * 32
    ct = np.zeros((m_pad, codes.shape[0]), np.uint8)
    ct[:m] = codes.T
    scores, pos = pallas_adc_tasks(
        jnp.arange(nlist, dtype=jnp.int32), jnp.full((nlist,), B, jnp.int32),
        jnp.arange(nlist, dtype=jnp.int32),
        jnp.broadcast_to(jax.device_put(q), (nlist, Qg, d)),
        jax.device_put(books_bd).astype(jnp.bfloat16),
        jax.device_put(clut.reshape(nlist, m * ksub)).astype(jnp.bfloat16),
        jax.device_put(cents), jax.device_put(ct),
        B=B, Qg=Qg, kk=kk, m=m, ksub=ksub, s_stack=adc_s_stack(m, ksub),
        is_l2=True,
    )
    for t in range(nlist):
        want = np.sort(gt[:, t * B : (t + 1) * B], 1)[:, ::-1][:, :kk]
        np.testing.assert_allclose(np.asarray(scores)[t], want, rtol=2e-2, atol=2e-1)


@check("adc_mc_chunked")
def _():
    m, ksub, d, nlist, Qg, kk = 64, 256, 128, 4, 32, 8
    geom = adc_mc_geometry(m, ksub, d)
    assert geom is not None
    books_bd, clut, cents, codes, q, gt = _adc_setup(m, ksub, d, nlist)
    ct = np.ascontiguousarray(codes.T.astype(np.int32))
    scores, pos = pallas_adc_tasks_mc(
        jnp.arange(nlist, dtype=jnp.int32), jnp.full((nlist,), B, jnp.int32),
        jnp.arange(nlist, dtype=jnp.int32),
        jnp.broadcast_to(jax.device_put(q), (nlist, Qg, d)),
        jax.device_put(books_bd).astype(jnp.bfloat16),
        jax.device_put(clut.reshape(nlist, m * ksub)).astype(jnp.bfloat16),
        jax.device_put(cents), jax.device_put(ct),
        B=B, Qg=Qg, kk=kk, m_c=geom[0], ksub=ksub, MC=geom[1], is_l2=True,
    )
    for t in range(nlist):
        want = np.sort(gt[:, t * B : (t + 1) * B], 1)[:, ::-1][:, :kk]
        np.testing.assert_allclose(np.asarray(scores)[t], want, rtol=2e-2, atol=3e-1)


@check("adc_mc_gist_geometry")
def _():
    # GIST m=96 at d_dev=1024 at the PRODUCTION shape: the dispatch clamps
    # Qg to 64 for the chunked kernel (Qg=128 measured 20.8MB scoped vmem
    # vs the 16MB stack; the books double-buffer alone is 8MB)
    m, ksub, d, nlist, Qg, kk = 96, 256, 1024, 2, 64, 32
    geom = adc_mc_geometry(m, ksub, d)
    assert geom is not None, "no geometry for GIST shape"
    books_bd, clut, cents, codes, q, gt = _adc_setup(m, ksub, d, nlist, dim=960, nq=Qg)
    ct = np.ascontiguousarray(codes.T.astype(np.int32))
    scores, _ = pallas_adc_tasks_mc(
        jnp.arange(nlist, dtype=jnp.int32), jnp.full((nlist,), B, jnp.int32),
        jnp.arange(nlist, dtype=jnp.int32),
        jnp.broadcast_to(jax.device_put(q), (nlist, Qg, d)),
        jax.device_put(books_bd).astype(jnp.bfloat16),
        jax.device_put(clut.reshape(nlist, m * ksub)).astype(jnp.bfloat16),
        jax.device_put(cents), jax.device_put(ct),
        B=B, Qg=Qg, kk=kk, m_c=geom[0], ksub=ksub, MC=geom[1], is_l2=True,
    )
    for t in range(nlist):
        want = np.sort(gt[:, t * B : (t + 1) * B], 1)[:, ::-1][:, :kk]
        np.testing.assert_allclose(np.asarray(scores)[t], want, rtol=3e-2, atol=1.0)


@check("adc_nib_4bit")
def _():
    # r5: nibble-packed 4-bit fastscan (SCANN default). The in-kernel unpack
    # is a (half, B) slice + two elementwise ops + a SUBLANE CONCAT — the
    # concat is the Mosaic-unproven piece
    m, ksub, d, nlist, Qg, kk = 64, 16, 128, 4, 32, 8
    books_bd, clut, cents, codes, q, gt = _adc_setup(m, ksub, d, nlist)
    half = m // 2
    packed = (codes[:, :half] | (codes[:, half:] << 4)).T
    m_pad = (half + 31) // 32 * 32
    ct = np.zeros((m_pad, codes.shape[0]), np.uint8)
    ct[:half] = packed
    scores, pos = pallas_adc_tasks(
        jnp.arange(nlist, dtype=jnp.int32), jnp.full((nlist,), B, jnp.int32),
        jnp.arange(nlist, dtype=jnp.int32),
        jnp.broadcast_to(jax.device_put(q), (nlist, Qg, d)),
        jax.device_put(books_bd).astype(jnp.bfloat16),
        jax.device_put(clut.reshape(nlist, m * ksub)).astype(jnp.bfloat16),
        jax.device_put(cents), jax.device_put(ct),
        B=B, Qg=Qg, kk=kk, m=m, ksub=ksub, s_stack=adc_s_stack(m, ksub),
        is_l2=True, nib=True,
    )
    for t in range(nlist):
        want = np.sort(gt[:, t * B : (t + 1) * B], 1)[:, ::-1][:, :kk]
        np.testing.assert_allclose(np.asarray(scores)[t], want, rtol=2e-2, atol=2e-1)


@check("sparse_packed_id_gather")
def _():
    # r5: fixed-width bitpacked sparse tail ids decoded in the gather
    from knowhere_tpu.ops.bitpack import pack_fixed, unpack_gather

    ids = rng.integers(0, 200_000, size=40_001).astype(np.uint32)
    p = pack_fixed(ids, 18)
    idx = rng.integers(0, ids.size, size=8192).astype(np.int32)
    got = np.asarray(unpack_gather(jax.device_put(p), jax.device_put(idx), 18))
    np.testing.assert_array_equal(got, ids[idx])


@check("inline4_walk_e2e")
def _():
    # r5: 4-bit inline walk codes are now the DEFAULT — drive the public
    # HNSW API at >=100k rows so the inline table actually builds
    import knowhere_tpu as kt
    from knowhere_tpu.dataset import GenDataSetFromArray as DS

    nb, d, k = 120_000, 128, 10
    xb = rng.standard_normal((nb, d), dtype=np.float32)
    xq = xb[:64] + 0.01 * rng.standard_normal((64, d)).astype(np.float32)
    idx = kt.IndexFactory.Instance().Create("HNSW").value()
    st = idx.Build(DS(xb), {"metric_type": "L2", "M": 16, "efConstruction": 80})
    assert st == kt.Status.success
    assert idx.node._inline is not None, "inline table did not build"
    r = idx.Search(DS(xq), {"metric_type": "L2", "k": k, "ef": 64}, kt.BitsetView())
    ids = np.asarray(r.value().ids).reshape(64, k)
    assert (ids[:, 0] == np.arange(64)).mean() > 0.95


print("\n==== SUMMARY ====")
for k_, v in results.items():
    print(f"{k_:24s} {v}")
fails = [k_ for k_, v in results.items() if v != "OK"]
sys.exit(1 if fails else 0)
