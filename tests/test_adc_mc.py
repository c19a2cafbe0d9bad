"""m-chunked Pallas ADC kernel (large-m PQ past the 8192-entry LUT cap) vs
the exact decode oracle, interpret mode (ops/ivf_pallas.pallas_adc_tasks_mc;
reference regime: faiss IVF_PQ m=96 on GIST-960)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knowhere_tpu.ops.ivf_pallas import (
    LIST_ALIGN,
    adc_mc_geometry,
    pallas_adc_tasks_mc,
)


def test_geometry():
    assert adc_mc_geometry(16, 256, 128) is None  # single-grid serves
    g = adc_mc_geometry(96, 256, 1024)  # GIST m=96
    assert g is not None and g[0] * g[1] == 96 and g[0] * 256 <= 4096
    g2 = adc_mc_geometry(64, 256, 128)
    assert g2 is not None and g2[0] * g2[1] == 64


@pytest.mark.parametrize("is_l2", [True, False])
def test_chunked_adc_matches_oracle(is_l2):
    rng = np.random.default_rng(0)
    d, m, ksub = 128, 64, 256
    sub = d // m
    nlist, B = 4, LIST_ALIGN
    nb = nlist * B
    Qg, kk = 32, 8
    geom = adc_mc_geometry(m, ksub, d)
    assert geom is not None
    m_c, MC = geom

    books = rng.standard_normal((m, ksub, sub)).astype(np.float32) * 0.3
    cents = rng.standard_normal((nlist, d)).astype(np.float32)
    codes = rng.integers(0, ksub, size=(nb, m)).astype(np.uint8)
    codes_t = np.ascontiguousarray(codes.T.astype(np.int32))
    q = rng.standard_normal((Qg, d)).astype(np.float32)

    books_bd = np.zeros((d, m * ksub), np.float32)
    for i in range(m):
        books_bd[i * sub : (i + 1) * sub, i * ksub : (i + 1) * ksub] = books[i].T
    if is_l2:
        c3 = cents.reshape(nlist, m, sub)
        clut = 2.0 * np.einsum("lms,mvs->lmv", c3, books) + np.sum(books**2, -1)[None]
    else:
        clut = np.zeros((nlist, m, ksub), np.float32)

    dec = books.reshape(m * ksub, sub)[
        codes.astype(np.int64) + (np.arange(m) * ksub)[None, :]
    ].reshape(nb, d)
    lists = np.repeat(np.arange(nlist), B)
    x = dec + cents[lists]
    if is_l2:
        gt = 2.0 * q @ x.T - np.sum(x**2, 1)[None, :]
    else:
        gt = q @ x.T

    Tc = nlist
    blk = jnp.arange(Tc, dtype=jnp.int32)
    nrows = jnp.full((Tc,), B, jnp.int32)
    lids = jnp.arange(Tc, dtype=jnp.int32)
    qt = jnp.broadcast_to(jax.device_put(q), (Tc, Qg, d))
    scores, pos = pallas_adc_tasks_mc(
        blk, nrows, lids, qt,
        jax.device_put(books_bd).astype(jnp.bfloat16),
        jax.device_put(clut.reshape(nlist, m * ksub)).astype(jnp.bfloat16),
        jax.device_put(cents),
        jax.device_put(codes_t),
        B=B, Qg=Qg, kk=kk, m_c=m_c, ksub=ksub, MC=MC, is_l2=is_l2,
        interpret=True,
    )
    scores = np.asarray(scores)
    for t in range(Tc):
        seg = gt[:, t * B : (t + 1) * B]
        want = np.sort(seg, axis=1)[:, ::-1][:, :kk]
        # bf16 LUT rounding bounds the tolerance (same as the single-grid
        # kernel's contract)
        np.testing.assert_allclose(scores[t], want, rtol=2e-2, atol=2e-1)


def test_chunked_adc_with_mask():
    rng = np.random.default_rng(1)
    d, m, ksub = 128, 64, 256
    nlist, B = 2, LIST_ALIGN
    nb = nlist * B
    Qg, kk = 32, 4
    m_c, MC = adc_mc_geometry(m, ksub, d)
    books = rng.standard_normal((m, ksub, d // m)).astype(np.float32) * 0.3
    cents = np.zeros((nlist, d), np.float32)
    codes = rng.integers(0, ksub, size=(nb, m)).astype(np.uint8)
    q = rng.standard_normal((Qg, d)).astype(np.float32)
    books_bd = np.zeros((d, m * ksub), np.float32)
    sub = d // m
    for i in range(m):
        books_bd[i * sub : (i + 1) * sub, i * ksub : (i + 1) * ksub] = books[i].T
    keep = np.zeros((nb // B, 1, B), np.int32)
    keep[:, :, ::2] = 1  # keep even positions only
    scores, pos = pallas_adc_tasks_mc(
        jnp.arange(nlist, dtype=jnp.int32),
        jnp.full((nlist,), B, jnp.int32),
        jnp.arange(nlist, dtype=jnp.int32),
        jnp.broadcast_to(jax.device_put(q), (nlist, Qg, d)),
        jax.device_put(books_bd).astype(jnp.bfloat16),
        jax.device_put(np.zeros((nlist, m * ksub), np.float32)).astype(jnp.bfloat16),
        jax.device_put(cents),
        jax.device_put(np.ascontiguousarray(codes.T.astype(np.int32))),
        jax.device_put(keep),
        B=B, Qg=Qg, kk=kk, m_c=m_c, ksub=ksub, MC=MC, is_l2=False,
        interpret=True,
    )
    pos = np.asarray(pos)
    assert ((pos % 2 == 0) | (pos < 0)).all()  # only kept (even) positions
