"""Pallas ADC (PQ/ScaNN) kernel vs exact decode oracle (interpret mode).

The kernel scores IVF-PQ candidates as LUT @ onehot(codes) on the MXU
(ops/ivf_pallas.pallas_adc_tasks); parity target is the reference's ADC LUT
scan (thirdparty/faiss/.../IndexIVFPQ.cpp scan_list_with_table). bf16 LUT
rounding bounds the tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knowhere_tpu.ops.ivf_pallas import LIST_ALIGN, adc_s_stack, pallas_adc_tasks


def _books_bd(books):
    import numpy as np
    import jax, jax.numpy as jnp
    m, ksub, sub = books.shape
    bd = np.zeros((m * sub, m * ksub), np.float32)
    for i in range(m):
        bd[i * sub : (i + 1) * sub, i * ksub : (i + 1) * ksub] = books[i].T
    return jax.device_put(bd).astype(jnp.bfloat16)


def _setup(metric, m, ksub, seed=0):
    rng = np.random.default_rng(seed)
    d = 128
    sub = d // m
    nlist = 4
    B = LIST_ALIGN
    nb_pad = nlist * B  # one block per list
    books = rng.standard_normal((m, ksub, sub)).astype(np.float32) * 0.3
    cents = rng.standard_normal((nlist, d)).astype(np.float32)
    codes = rng.integers(0, ksub, size=(nb_pad, m)).astype(np.uint8)
    m_pad = (m + 7) // 8 * 8
    codes_t = np.zeros((m_pad, nb_pad), np.int32)
    codes_t[:m] = codes.T
    nq = 16
    q = rng.standard_normal((nq, d)).astype(np.float32)

    is_l2 = metric == "L2"
    if is_l2:
        c3 = cents.reshape(nlist, m, sub)
        clut = 2.0 * np.einsum("lms,mvs->lmv", c3, books) + np.sum(books**2, -1)[None]
    else:
        clut = np.zeros((nlist, m, ksub), np.float32)
    clut_dev = jax.device_put(clut.reshape(nlist, m * ksub)).astype(jnp.bfloat16)

    # decode oracle: x = centroid + concat_m books[m][code]
    dec = books.reshape(m * ksub, sub)[
        codes.astype(np.int64) + (np.arange(m) * ksub)[None, :]
    ].reshape(nb_pad, d)
    lists = np.repeat(np.arange(nlist), B)
    x = dec + cents[lists]
    if is_l2:
        gt_score = 2.0 * q @ x.T - np.sum(x**2, axis=1)[None, :]
    else:
        gt_score = q @ x.T
    return q, books, cents, codes_t, clut_dev, gt_score, is_l2


@pytest.mark.parametrize(
    "metric,m,ksub,nib",
    [
        ("L2", 16, 256, False),
        ("IP", 16, 256, False),
        ("L2", 64, 16, False),
        # nibble-packed 4-bit fastscan layout: subspace r in row r's low
        # nibble, r + m/2 in its high nibble (models/ivf.py build side)
        ("L2", 64, 16, True),
        ("IP", 32, 16, True),
    ],
)
def test_adc_kernel_matches_decode_oracle(metric, m, ksub, nib):
    q, books, cents, codes_t, clut_dev, gt_score, is_l2 = _setup(metric, m, ksub)
    if nib:
        codes = codes_t[:m].astype(np.uint8)  # (m, nb_pad) logical
        half = m // 2
        packed = codes[:half] | (codes[half:] << 4)
        m_pad = (half + 31) // 32 * 32
        codes_t = np.zeros((m_pad, codes.shape[1]), np.uint8)
        codes_t[:half] = packed
    B = LIST_ALIGN
    nq = q.shape[0]
    Qg = 16
    kk = 10
    nlist = cents.shape[0]

    # one task per (list block, all queries); every list has exactly one block
    Tc = 8  # pad to 8 tasks
    blk = np.zeros(Tc, np.int32)
    nrows = np.zeros(Tc, np.int32)
    lids = np.zeros(Tc, np.int32)
    qids = np.full((Tc, Qg), -1, np.int32)
    for t in range(nlist):
        blk[t] = t
        nrows[t] = B if t < nlist - 1 else B - 17  # ragged tail list
        lids[t] = t
        qids[t] = np.arange(nq)

    scores, pos = pallas_adc_tasks(
        jax.device_put(blk),
        jax.device_put(nrows),
        jax.device_put(lids),
        jax.device_put(q[np.clip(qids, 0, None)]),
        _books_bd(books),
        clut_dev,
        jax.device_put(cents),
        jax.device_put(codes_t),
        B=B,
        Qg=Qg,
        kk=kk,
        m=m,
        ksub=ksub,
        s_stack=adc_s_stack(m, ksub),
        is_l2=is_l2,
        nib=nib,
        interpret=True,
    )
    scores = np.asarray(scores)
    pos = np.asarray(pos)

    for t in range(nlist):
        n = int(nrows[t])
        block_gt = gt_score[:, t * B : t * B + n]  # (nq, n) masked to valid rows
        order = np.argsort(-block_gt, axis=1)[:, :kk]
        gt_top = np.take_along_axis(block_gt, order, axis=1)
        for qi in range(nq):
            got_s = scores[t, qi, :]
            got_p = pos[t, qi, :] - t * B
            # positions must be valid and scores match the oracle's values
            assert (got_p >= 0).all() and (got_p < n).all()
            oracle_at_p = block_gt[qi, got_p]
            # tolerance: the in-kernel LUT matmul uses bf16 codebooks (sum of
            # m bf16-rounded entries ~ 3e-2 absolute at these scales) — far
            # tighter than the reference fastscan's uint8-quantized LUTs
            np.testing.assert_allclose(got_s, oracle_at_p, rtol=3e-2, atol=3e-2)
            # top-k sets agree within bf16-LUT noise: compare score VALUES
            np.testing.assert_allclose(
                np.sort(got_s)[::-1], gt_top[qi], rtol=3e-2, atol=3e-2
            )


@pytest.mark.parametrize("metric", ["L2", "IP"])
def test_sq_kernel_matches_decode_oracle(metric):
    """Pallas SQ8 scan (in-kernel u8 affine decode) vs numpy decode oracle."""
    from knowhere_tpu.ops.ivf_pallas import pallas_sq_tasks

    rng = np.random.default_rng(5)
    d = 128
    B = LIST_ALIGN
    nb_pad = 2 * B
    levels = 256
    vmin = rng.standard_normal(d).astype(np.float32)
    vdiff = (rng.random(d).astype(np.float32) + 0.5) * 2.0
    codes = rng.integers(0, levels, size=(nb_pad, d)).astype(np.uint8)
    rows = vmin[None] + (codes.astype(np.float32) + 0.5) / levels * vdiff[None]
    nq, Qg, kk = 8, 8, 10
    q = rng.standard_normal((nq, d)).astype(np.float32)
    is_l2 = metric == "L2"
    gt = 2.0 * q @ rows.T - np.sum(rows**2, 1)[None] if is_l2 else q @ rows.T

    Tc = 8
    blk = np.zeros(Tc, np.int32)
    nrows = np.zeros(Tc, np.int32)
    qids = np.full((Tc, Qg), -1, np.int32)
    for t in range(2):
        blk[t], nrows[t] = t, B if t == 0 else B - 9
        qids[t] = np.arange(nq)
    s, p = pallas_sq_tasks(
        jax.device_put(blk),
        jax.device_put(nrows),
        jax.device_put(q[np.clip(qids, 0, None)]),
        jax.device_put(vmin.reshape(1, -1)),
        jax.device_put(vdiff.reshape(1, -1)),
        jax.device_put(codes),
        B=B, Qg=Qg, kk=kk, levels=levels, is_l2=is_l2, three_pass=False,
        interpret=True,
    )
    s, p = np.asarray(s), np.asarray(p)
    for t in range(2):
        n = int(nrows[t])
        block_gt = gt[:, t * B : t * B + n]
        gt_top = np.take_along_axis(
            block_gt, np.argsort(-block_gt, 1)[:, :kk], axis=1
        )
        for qi in range(nq):
            np.testing.assert_allclose(
                np.sort(s[t, qi])[::-1], gt_top[qi], rtol=2e-2, atol=2e-2
            )
            got_p = p[t, qi] - t * B
            assert (got_p >= 0).all() and (got_p < n).all()


@pytest.mark.parametrize("kernel", ["adc", "sq", "raw"])
def test_pallas_kernels_respect_bitset_mask(kernel):
    """Masked rows never surface: parity with the reference's IDSelector
    filtering inside the IVF scan (src/index/ivf/ivf.cc:967-968)."""
    from knowhere_tpu.ops.ivf_pallas import (
        pallas_scan_tasks,
        pallas_sq_tasks,
    )

    rng = np.random.default_rng(11)
    d = 128
    B = LIST_ALIGN
    nq, Qg, kk = 8, 8, 10
    q = rng.standard_normal((nq, d)).astype(np.float32)
    keep = rng.random(2 * B) > 0.5  # drop ~half the rows
    keep_blk = jax.device_put(keep.astype(np.int32).reshape(-1, 1, B))

    Tc = 8
    blk = np.zeros(Tc, np.int32)
    nrows = np.zeros(Tc, np.int32)
    qids = np.full((Tc, Qg), -1, np.int32)
    for t in range(2):
        blk[t], nrows[t] = t, B if t == 0 else B - 9
        qids[t] = np.arange(nq)

    if kernel == "adc":
        m, ksub = 16, 256
        q2, books, cents, codes_t, clut_dev, gt_score, _ = _setup("L2", m, ksub, seed=11)
        lids = np.zeros(Tc, np.int32)
        lids[1] = 1
        keep2 = rng.random(codes_t.shape[1]) > 0.5
        s, p = pallas_adc_tasks(
            jax.device_put(blk), jax.device_put(nrows), jax.device_put(lids),
            jax.device_put(q2[np.clip(qids, 0, None)]), _books_bd(books),
            clut_dev, jax.device_put(cents), jax.device_put(codes_t),
            jax.device_put(keep2.astype(np.int32).reshape(-1, 1, B)),
            B=B, Qg=Qg, kk=kk, m=m, ksub=ksub,
            s_stack=adc_s_stack(m, ksub), is_l2=True, interpret=True,
        )
        keep = keep2
    elif kernel == "sq":
        levels = 256
        vmin = rng.standard_normal(d).astype(np.float32)
        vdiff = (rng.random(d).astype(np.float32) + 0.5) * 2.0
        codes = rng.integers(0, levels, size=(2 * B, d)).astype(np.uint8)
        s, p = pallas_sq_tasks(
            jax.device_put(blk), jax.device_put(nrows),
            jax.device_put(q[np.clip(qids, 0, None)]),
            jax.device_put(vmin.reshape(1, -1)), jax.device_put(vdiff.reshape(1, -1)),
            jax.device_put(codes), keep_blk,
            B=B, Qg=Qg, kk=kk, levels=levels, is_l2=True, three_pass=False,
            interpret=True,
        )
    else:
        data = rng.standard_normal((2 * B, d)).astype(np.float32)
        s, p = pallas_scan_tasks(
            jax.device_put(blk), jax.device_put(nrows),
            jax.device_put(q[np.clip(qids, 0, None)]),
            jax.device_put(data), keep_blk,
            B=B, Qg=Qg, kk=kk, is_l2=True, three_pass=False, interpret=True,
        )
    p = np.asarray(p)
    for t in range(2):
        got = p[t, :nq].reshape(-1)
        got = got[got >= 0]
        assert (got >= t * B).all() and (got < t * B + int(nrows[t])).all()
        assert keep[got].all(), "a masked-out row surfaced in top-k"


def test_adc_end_to_end_ivf_pq_recall():
    """IVF_PQ search through _pallas_adc_search (interpret) vs XLA scan path."""
    from knowhere_tpu.ops.ivf_scan import _pallas_adc_search, coarse_probe_host

    rng = np.random.default_rng(3)
    d, m, ksub = 128, 16, 256
    nlist = 4
    B = LIST_ALIGN
    q, books, cents, codes_t, clut_dev, gt_score, _ = _setup("L2", m, ksub, seed=3)
    nb_pad = codes_t.shape[1]
    lens = np.array([B, B, B, B - 17], np.int64)
    offsets = np.arange(nlist + 1, dtype=np.int64) * B

    store = {
        "codebooks": jax.device_put(books),
        "centroids": jax.device_put(cents),
        "codes_t": jax.device_put(codes_t),
        "clut": clut_dev,
        "books_bd": _books_bd(books),
    }
    nprobe = nlist
    probes = coarse_probe_host(q, cents, nprobe, True)
    k = 10
    s, p = _pallas_adc_search(
        jax.device_put(q), store, probes, offsets, lens, k, True, 16, False,
        interpret=True,
    )
    # oracle over all valid rows
    valid = np.zeros(nb_pad, bool)
    for l in range(nlist):
        valid[l * B : l * B + lens[l]] = True
    gt_masked = np.where(valid[None, :], gt_score, -np.inf)
    gt_top = np.argsort(-gt_masked, axis=1)[:, :k]
    hits = sum(
        len(set(gt_top[i].tolist()) & set(p[i].tolist())) for i in range(q.shape[0])
    )
    assert hits / (q.shape[0] * k) >= 0.95


@pytest.mark.parametrize("metric", ["L2", "IP"])
def test_rbq_kernel_matches_estimator_oracle(metric):
    """Pallas RaBitQ scan vs the numpy sign-plane estimator (the same formula
    the XLA task scan uses; reference: faiss IndexIVFRaBitQ estimator)."""
    from knowhere_tpu.ops.ivf_pallas import pallas_rbq_tasks

    rng = np.random.default_rng(17)
    d = 128
    B = LIST_ALIGN
    nlist = 2
    nb_pad = nlist * B
    signs = (rng.integers(0, 2, size=(nb_pad, d)) * 2 - 1).astype(np.int8)
    r_norm = (rng.random(nb_pad).astype(np.float32) + 0.1) * 2.0
    tval = rng.random(nb_pad).astype(np.float32) * 0.9 + 0.1
    cents = rng.standard_normal((nlist, d)).astype(np.float32)
    nq, Qg, kk = 8, 8, 10
    q = rng.standard_normal((nq, d)).astype(np.float32)
    is_l2 = metric == "L2"

    lists = np.repeat(np.arange(nlist), B)
    qr = q[:, None, :] - cents[lists][None]  # (nq, nb, d)
    dots = np.einsum("qnd,nd->qn", qr, signs.astype(np.float32))
    ip_est = r_norm[None] * dots / (np.maximum(tval, 1e-6)[None] * np.sqrt(d))
    if is_l2:
        gt = -((qr**2).sum(-1) + (r_norm**2)[None] - 2.0 * ip_est)
    else:
        gt = (q @ cents[lists].T) + ip_est

    Tc = 8
    blk = np.zeros(Tc, np.int32)
    nrows = np.zeros(Tc, np.int32)
    lids = np.zeros(Tc, np.int32)
    qids = np.full((Tc, Qg), -1, np.int32)
    for t in range(nlist):
        blk[t], nrows[t], lids[t] = t, B if t == 0 else B - 21, t
        qids[t] = np.arange(nq)
    s, p = pallas_rbq_tasks(
        jax.device_put(blk), jax.device_put(nrows), jax.device_put(lids),
        jax.device_put(q[np.clip(qids, 0, None)]),
        jax.device_put(cents), jax.device_put(signs),
        jax.device_put(r_norm.reshape(nlist, 1, B)),
        jax.device_put(tval.reshape(nlist, 1, B)),
        B=B, Qg=Qg, kk=kk, is_l2=is_l2, three_pass=True, interpret=True,
    )
    s, p = np.asarray(s), np.asarray(p)
    for t in range(nlist):
        n = int(nrows[t])
        block_gt = gt[:, t * B : t * B + n]
        gt_top = np.take_along_axis(block_gt, np.argsort(-block_gt, 1)[:, :kk], 1)
        for qi in range(nq):
            got_p = p[t, qi] - t * B
            assert (got_p >= 0).all() and (got_p < n).all()
            np.testing.assert_allclose(
                np.sort(s[t, qi])[::-1], gt_top[qi], rtol=2e-2, atol=2e-2
            )


def test_task_kk_cap():
    """Per-task width caps at 32 (kk>32 chunked column top-k is a recorded
    NEGATIVE result: Mosaic layout aborts on every tested shape; wide pools
    ride the XLA fallback instead — ops/ivf_pallas.task_kk docstring)."""
    from knowhere_tpu.ops.ivf_pallas import task_kk

    for k in (1, 10, 32, 33, 80, 320, 2560):
        assert task_kk(k, 512) == min(k, 32)


def test_adc_unavailable_for_large_lut():
    """m*ksub > 8192 (e.g. GIST m=96) must NOT select the Pallas ADC kernel
    (per-task QLUT exceeds VMEM; Mosaic aborts)."""
    import numpy as np
    from knowhere_tpu.ops.ivf_pallas import pallas_adc_available

    offsets = np.array([0, 512, 1024], np.int64)
    store = {
        "codes_t": np.zeros((96, 1024), np.int32),
        "clut": np.zeros((2, 96 * 256), np.float32),
        "books_bd": np.zeros((1024, 96 * 256), np.float32),
    }
    assert not pallas_adc_available(store, 1024, 10, offsets, False, nq_pad=256, interpret=True)


def test_model_nibble_packing_convention():
    """The BUILD-side 4-bit packing (models/ivf.py codes_t upload) must match
    the kernel's unpack convention (subspace r low nibble, r + m/2 high):
    both sides are tested against the same oracle, and this pins the model's
    store to it."""
    import knowhere_tpu as kt
    from knowhere_tpu.dataset import GenDataSetFromArray as DS

    import os

    os.environ["KNOWHERE_IVF_ALIGN_MIN"] = "4096"  # aligned layout at test scale
    try:
        rng = np.random.default_rng(3)
        xb = rng.standard_normal((8192, 128), dtype=np.float32)
        idx = kt.IndexFactory.Instance().Create("SCANN").value()
        st = idx.Build(DS(xb), {"metric_type": "L2", "nlist": 8, "sub_dim": 2,
                                "with_raw_data": True})
    finally:
        os.environ.pop("KNOWHERE_IVF_ALIGN_MIN", None)
    assert st == kt.Status.success
    node = idx.node
    assert node._pq.ksub == 16
    assert node._codes_nib is True
    sorted_codes = node._sorted_payload["codes"]  # (nb_pad, m) u8, 0..15
    m = sorted_codes.shape[1]
    half = m // 2
    ct = np.asarray(node._store["codes_t"])  # (m_pad_half, nb_pad) u8
    want = (sorted_codes[:, :half] | (sorted_codes[:, half:] << 4)).T
    assert ct.dtype == np.uint8
    np.testing.assert_array_equal(ct[:half], want)
    # logical codes reconstruct exactly from the packed stream
    np.testing.assert_array_equal(ct[:half] & 15, sorted_codes[:, :half].T)
    np.testing.assert_array_equal(ct[:half] >> 4, sorted_codes[:, half:].T)
