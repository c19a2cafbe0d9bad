"""int8 fast-scan kernel vs exact quantized oracle (interpret mode).

The kernel ranks IVF candidates with an int8 x int8 -> int32 MXU matmul
(ops/ivf_pallas.pallas_int8_tasks); parity target is the reference's IVF_SQ8
speed family (src/index/ivf/ivf.cc + thirdparty/faiss IndexScalarQuantizer
sq8 scan). The estimator is deterministic given the codes, so the oracle
reproduces it bit-for-bit in numpy (f32 rounding only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knowhere_tpu.ops.ivf_pallas import LIST_ALIGN, pallas_int8_tasks
from knowhere_tpu.ops.ivf_scan import quantize_queries_int8


def _quantize(x, is_l2):
    mu = x.mean(0).astype(np.float32) if is_l2 else np.zeros(x.shape[1], np.float32)
    xc = x - mu
    s = np.maximum(np.abs(xc).max(0) / 127.0, 1e-12).astype(np.float32)
    codes = np.clip(np.rint(xc / s), -127, 127).astype(np.int8)
    nrm = np.sum(xc.astype(np.float64) ** 2, 1).astype(np.float32)
    return mu, s, codes, nrm


@pytest.mark.parametrize("is_l2", [True, False])
def test_int8_kernel_matches_oracle(is_l2):
    rng = np.random.default_rng(0)
    d, B = 128, LIST_ALIGN
    nlist = 4
    nb = nlist * B
    Qg, kk = 32, 8
    x = rng.standard_normal((nb, d)).astype(np.float32)
    q = rng.standard_normal((Qg, d)).astype(np.float32)

    mu, s, codes, nrm = _quantize(x, is_l2)
    zi, sz = quantize_queries_int8(
        jax.device_put(q), jax.device_put(mu), jax.device_put(s)
    )
    zi_h, sz_h = np.asarray(zi), np.asarray(sz)

    # oracle: the same estimator in numpy
    dots = zi_h.astype(np.int32) @ codes.astype(np.int32).T  # (Qg, nb)
    if is_l2:
        est = 2.0 * sz_h[:, None] * dots - nrm[None, :]
    else:
        est = sz_h[:, None] * dots

    Tc = nlist  # one task per block, all queries in one group
    blk = jnp.arange(Tc, dtype=jnp.int32)
    nrows = jnp.full((Tc,), B, jnp.int32)
    q_task = jnp.broadcast_to(zi, (Tc, Qg, d))
    s_task = jnp.broadcast_to(sz[:, None], (Tc, Qg, 1))
    scores, pos = pallas_int8_tasks(
        blk, nrows, q_task, s_task, jax.device_put(codes),
        jax.device_put(nrm.reshape(nb // B, 1, B)),
        B=B, Qg=Qg, kk=kk, is_l2=is_l2, interpret=True,
    )
    scores, pos = np.asarray(scores), np.asarray(pos)
    for t in range(Tc):
        seg = est[:, t * B : (t + 1) * B]
        order = np.argsort(-seg, axis=1, kind="stable")[:, :kk]
        want = np.take_along_axis(seg, order, axis=1)
        np.testing.assert_allclose(scores[t], want, rtol=1e-5, atol=1e-3)
        got_pos = pos[t] - t * B
        # positions may tie-swap; scores already checked, verify membership
        assert ((got_pos >= 0) & (got_pos < B)).all()


def test_int8_kernel_u8_codes_matches_i8_path():
    """The u8-codes variant (in-kernel xor-0x80 recenter) must score exactly
    like feeding the pre-centered i8 codes."""
    rng = np.random.default_rng(9)
    d, B, Qg, kk = 128, LIST_ALIGN, 32, 8
    nb = 2 * B
    codes_u8 = rng.integers(0, 256, (nb, d)).astype(np.uint8)
    ci = (codes_u8.astype(np.int16) - 128).astype(np.int8)
    nrm = rng.uniform(1, 2, nb).astype(np.float32)
    zi = rng.integers(-127, 128, (Qg, d)).astype(np.int8)
    sz = rng.uniform(0.01, 0.1, Qg).astype(np.float32)
    Tc = nb // B
    blk = jnp.arange(Tc, dtype=jnp.int32)
    nrows = jnp.full((Tc,), B, jnp.int32)
    qt = jnp.broadcast_to(jnp.asarray(zi), (Tc, Qg, d))
    st = jnp.broadcast_to(jnp.asarray(sz)[:, None], (Tc, Qg, 1))
    nb_blk = jax.device_put(nrm.reshape(Tc, 1, B))
    s_i8, p_i8 = pallas_int8_tasks(
        blk, nrows, qt, st, jax.device_put(ci), nb_blk,
        B=B, Qg=Qg, kk=kk, is_l2=True, interpret=True,
    )
    s_u8, p_u8 = pallas_int8_tasks(
        blk, nrows, qt, st, jax.device_put(codes_u8), nb_blk,
        B=B, Qg=Qg, kk=kk, is_l2=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(s_i8), np.asarray(s_u8))
    np.testing.assert_array_equal(np.asarray(p_i8), np.asarray(p_u8))


def test_int8_estimator_ranks_like_exact():
    """Top-10 of the int8 estimator must overlap the exact top-10 heavily on
    gaussian data (the production path re-ranks exactly anyway)."""
    rng = np.random.default_rng(1)
    d, nb, nq = 128, 4096, 32
    x = rng.standard_normal((nb, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    mu, s, codes, nrm = _quantize(x, True)
    zi, sz = quantize_queries_int8(
        jax.device_put(q), jax.device_put(mu), jax.device_put(s)
    )
    zi_h, sz_h = np.asarray(zi), np.asarray(sz)
    est = 2.0 * sz_h[:, None] * (zi_h.astype(np.int32) @ codes.astype(np.int32).T) - nrm[None, :]
    exact = 2.0 * q @ (x - mu).T - nrm[None, :]
    hits = 0
    for i in range(nq):
        a = set(np.argsort(-est[i])[:10].tolist())
        b = set(np.argsort(-exact[i])[:10].tolist())
        hits += len(a & b)
    assert hits / (nq * 10) > 0.95


def test_sq8_sidecar_estimator_is_topk_equivalent():
    """The SQ8 affine grid factors into the symmetric int8 estimator with a
    per-query constant (models/ivf._build_sq8_int8_sidecar): per-query top-k
    of the sidecar scores must equal top-k of exact decoded-SQ8 scores."""
    rng = np.random.default_rng(4)
    nb, d, nq, levels = 2048, 128, 16, 256
    x = rng.standard_normal((nb, d)).astype(np.float32) * rng.uniform(0.5, 2, d).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    vmin = x.min(0)
    vdiff = x.max(0) - vmin
    s = vdiff / levels
    codes = np.clip(np.floor((x - vmin) / np.maximum(s, 1e-12)), 0, levels - 1).astype(np.uint8)
    dec = vmin + (codes.astype(np.float32) + 0.5) * s
    exact = 2.0 * q @ dec.T - np.sum(dec**2, 1)[None, :]

    zi, sz = quantize_queries_int8(
        jax.device_put(q), jax.device_put(np.zeros(d, np.float32)), jax.device_put(s)
    )
    ci = (codes.astype(np.int16) - 128).astype(np.int8)
    est = 2.0 * np.asarray(sz)[:, None] * (
        np.asarray(zi).astype(np.int32) @ ci.astype(np.int32).T
    ) - np.sum(dec**2, 1)[None, :]
    # est differs from exact by a per-query constant + int8 rounding: the
    # top-10 sets must overlap near-perfectly
    hits = 0
    for i in range(nq):
        a = set(np.argsort(-est[i])[:10].tolist())
        b = set(np.argsort(-exact[i])[:10].tolist())
        hits += len(a & b)
    assert hits / (nq * 10) > 0.97, hits / (nq * 10)


def test_ivf_sq8_sidecar_built_and_search_exact_under_stored(monkeypatch):
    """IVF_SQ8 builds the int8 sidecar on aligned layouts; search results on
    the CPU mesh (bf16 path) must stay exact-under-stored-values."""
    import knowhere_tpu as kt

    monkeypatch.setenv("KNOWHERE_IVF_ALIGN_MIN", "4096")
    rng = np.random.default_rng(5)
    nb, d = 6000, 128
    xb = rng.standard_normal((nb, d)).astype(np.float32)
    idx = kt.IndexFactory.Instance().Create("IVF_SQ8").value()
    cfg = {"metric_type": "L2", "nlist": 8, "sq_type": "SQ8"}
    assert idx.Train(kt.GenDataSetFromArray(xb), cfg).name == "success"
    assert idx.Add(kt.GenDataSetFromArray(xb), cfg).name == "success"
    st = idx.node._store
    # SQ8 scans its resident u8 codes (recentered in-kernel) — no i8 copy
    assert "i8_nrm_blk" in st and "data_i8" not in st
    assert st["codes"].dtype == jnp.uint8
    r = idx.Search(kt.GenDataSetFromArray(xb[:8]), {"metric_type": "L2", "k": 5, "nprobe": 8})
    assert r.has_value(), r.what()
    ids = np.asarray(r.value().ids).reshape(8, 5)
    assert (ids[:, 0] == np.arange(8)).mean() >= 0.8  # SQ8 self-match


def test_ivf_flat_sidecar_built_and_search_unchanged(monkeypatch):
    """IVF_FLAT builds the int8 sidecar on f32 stores; on the CPU test mesh
    the Pallas gate keeps the bf16 path, and results must stay exact."""
    import knowhere_tpu as kt

    monkeypatch.setenv("KNOWHERE_IVF_ALIGN_MIN", "4096")  # aligned layout
    rng = np.random.default_rng(2)
    nb, d = 6000, 128
    xb = rng.standard_normal((nb, d)).astype(np.float32)
    idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
    cfg = {"metric_type": "L2", "nlist": 8}
    assert idx.Train(kt.GenDataSetFromArray(xb), cfg).name == "success"
    assert idx.Add(kt.GenDataSetFromArray(xb), cfg).name == "success"
    st = idx.node._store
    assert "data_i8" in st and "i8_nrm_blk" in st and "i8_scale" in st
    assert st["data_i8"].dtype == jnp.int8
    r = idx.Search(kt.GenDataSetFromArray(xb[:8]), {"metric_type": "L2", "k": 5, "nprobe": 8})
    assert r.has_value(), r.what()
    ids = np.asarray(r.value().ids).reshape(8, 5)
    assert (ids[:, 0] == np.arange(8)).all()
