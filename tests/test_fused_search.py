"""Fused one-dispatch IVF search + on-device task builder.

The on-device builder (ops/ivf_scan.build_scan_tasks_jax) must be
semantically identical to the host inverter (build_scan_tasks): same
(query, row) coverage, collision-free merge slots within the static S bound.
The fused jit wrapper (models/ivf._fused_search_fn) must return exactly the
unfused orchestration's results through the public API.

Reference behavior being replaced: the per-query inverted-list scan driven
from src/index/ivf/ivf.cc:955-1210 — on this platform every dispatch costs
~20ms flat over the device tunnel, so the whole search compiles into ONE XLA
program (probe -> task build -> scan -> merge -> refine -> packed results).
"""

from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.ops.ivf_scan import (
    build_scan_tasks,
    build_scan_tasks_jax,
    device_task_bounds,
    ivf_scan_search,
)


def _coverage(row_start, nrows, qids):
    pairs = set()
    for t in range(row_start.shape[0]):
        if nrows[t] <= 0:
            continue
        for j in range(qids.shape[1]):
            q = qids[t, j]
            if q < 0:
                continue
            for r in range(int(nrows[t])):
                pairs.add((int(q), int(row_start[t] + r)))
    return pairs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_task_builder_matches_host(seed):
    rng = np.random.default_rng(seed)
    nlist, B, Qg = 37, 16, 8
    lens = rng.integers(0, 90, size=nlist).astype(np.int64)
    lens[3] = 0  # empty list
    offsets = np.concatenate([[0], np.cumsum((lens + B - 1) // B * B)])
    nq, nprobe = 23, 5
    probes = rng.integers(-1, nlist, size=(nq, nprobe)).astype(np.int32)

    host = build_scan_tasks(probes, offsets, B, Qg, list_lengths=lens)
    T_max, G_max, S_max = device_task_bounds(nq, nprobe, lens, B, Qg)
    rs, nr, li, qi, sl = map(
        np.asarray,
        build_scan_tasks_jax(
            jnp.asarray(probes),
            jnp.asarray(offsets, jnp.int32),
            jnp.asarray(lens, jnp.int32),
            B=B, Qg=Qg, T_max=T_max, G_max=G_max, nlist=nlist,
        ),
    )
    assert int((nr > 0).sum()) == host.row_start.shape[0]
    assert _coverage(rs, nr, qi) == _coverage(host.row_start, host.nrows, host.qids)
    # merge slots must be unique per query and within the static S bound
    seen = defaultdict(set)
    for t in range(rs.shape[0]):
        if nr[t] <= 0:
            continue
        for j in range(qi.shape[1]):
            q = qi[t, j]
            if q < 0:
                continue
            assert sl[t, j] not in seen[q]
            assert sl[t, j] < S_max
            seen[q].add(int(sl[t, j]))
    # every valid task's block lies inside its list's padded span
    for t in range(rs.shape[0]):
        if nr[t] <= 0:
            continue
        l = int(li[t])
        span = ((lens[l] + B - 1) // B) * B
        assert offsets[l] <= rs[t] and rs[t] + nr[t] <= offsets[l] + span


def test_scan_device_probes_match_host_probes(rng):
    from knowhere_tpu.ops.ivf_scan import coarse_probe_host

    nlist, B = 16, 512
    d, nb, nq, k, nprobe = 128, 6000, 64, 10, 4
    xb = rng.standard_normal((nb, d)).astype(np.float32)
    xq = rng.standard_normal((nq, d)).astype(np.float32)
    assign = rng.integers(0, nlist, nb)
    lens = np.bincount(assign, minlength=nlist)
    offsets = np.concatenate([[0], np.cumsum((lens + B - 1) // B * B)])
    data = np.zeros((int(offsets[-1]), d), np.float32)
    order = np.argsort(assign, kind="stable")
    cur = 0
    for l in range(nlist):
        data[offsets[l] : offsets[l] + lens[l]] = xb[order[cur : cur + lens[l]]]
        cur += lens[l]
    cents = np.stack(
        [data[offsets[l] : offsets[l] + max(lens[l], 1)].mean(0) for l in range(nlist)]
    )
    store = {"data": jax.device_put(data), "norms": jax.device_put((data**2).sum(1))}
    probes = coarse_probe_host(xq, cents, nprobe, True)
    q_dev = jax.device_put(xq)
    s1, p1 = ivf_scan_search(
        q_dev, dict(store), "raw", probes, offsets, k, True,
        list_lengths=lens, prec="exact",
    )
    s2, p2 = ivf_scan_search(
        q_dev, dict(store), "raw", jnp.asarray(probes), offsets, k, True,
        list_lengths=lens, prec="exact",
    )
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize(
    "name,bcfg,scfg",
    [
        ("IVF_FLAT", {"nlist": 32}, {"nprobe": 8}),
        (
            "IVF_PQ",
            {"nlist": 32, "m": 16, "nbits": 8, "refine": True, "refine_type": "FP16"},
            {"nprobe": 8, "refine_k": 4},
        ),
        ("IVF_SQ8", {"nlist": 32, "sq_type": "SQ8"}, {"nprobe": 8}),
    ],
)
def test_fused_public_api_matches_unfused(name, bcfg, scfg, rng, monkeypatch):
    nb, d, nq, k = 8000, 128, 100, 10
    xb = rng.standard_normal((nb, d)).astype(np.float32)
    xq = rng.standard_normal((nq, d)).astype(np.float32)
    base = kt.GenDataSetFromArray(xb)
    idx = kt.IndexFactory.Instance().Create(name).value()
    assert idx.Build(base, {"metric_type": "L2", **bcfg}) == kt.Status.success

    monkeypatch.setenv("KNOWHERE_FORCE_FUSED", "1")
    r1 = idx.Search(
        kt.GenDataSetFromArray(xq), {"metric_type": "L2", "k": k, **scfg}
    )
    monkeypatch.delenv("KNOWHERE_FORCE_FUSED")
    monkeypatch.setenv("KNOWHERE_DISABLE_FUSED", "1")
    r2 = idx.Search(
        kt.GenDataSetFromArray(xq), {"metric_type": "L2", "k": k, **scfg}
    )
    assert r1.has_value() and r2.has_value()
    np.testing.assert_array_equal(
        r1.value().ids.reshape(nq, k), r2.value().ids.reshape(nq, k)
    )
