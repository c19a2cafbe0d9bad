"""Fixed-width bitpack codec (ops/bitpack.py) — the resident sparse-tail
posting compression (reference: src/index/sparse/codec/simd_bitpacking*;
here fixed-width so XLA gathers keep random access)."""

import numpy as np
import pytest

import jax

from knowhere_tpu.ops.bitpack import pack_fixed, unpack_all, unpack_gather, width_for


@pytest.mark.parametrize("bits", [1, 3, 8, 13, 16, 17, 18, 24, 31, 32])
def test_roundtrip_and_gather(bits):
    rng = np.random.default_rng(bits)
    hi = (1 << bits) if bits < 32 else (1 << 32)
    a = rng.integers(0, hi, size=5003, dtype=np.uint64).astype(np.uint32)
    p = pack_fixed(a, bits)
    # stream density: ceil(n*bits/32)+1 words
    assert p.size == (a.size * bits + 31) // 32 + 1
    assert (unpack_all(p, a.size, bits) == a).all()
    idx = rng.integers(0, a.size, size=2048).astype(np.int32)
    got = np.asarray(unpack_gather(jax.device_put(p), jax.device_put(idx), bits))
    assert (got == a[idx]).all()


def test_word_boundary_offsets():
    # bits=20 exercises every offset mod 32 including ofs==0 (guarded shift)
    a = np.arange(64, dtype=np.uint32) + 0xFF000
    p = pack_fixed(a, 20)
    idx = np.arange(64, dtype=np.int32)
    got = np.asarray(unpack_gather(jax.device_put(p), jax.device_put(idx), 20))
    assert (got == a).all()


def test_value_too_wide_rejected():
    with pytest.raises(ValueError):
        pack_fixed(np.asarray([8], np.uint32), 3)


def test_empty_and_width_for():
    assert pack_fixed(np.zeros(0, np.uint32), 7).size == 1
    assert unpack_all(pack_fixed(np.zeros(0, np.uint32), 7), 0, 7).size == 0
    assert width_for(2) == 1
    assert width_for(65535) == 16
    assert width_for(65536) == 16
    assert width_for(65537) == 17
    assert width_for(200_000) == 18
    assert width_for(10_000_000) == 24
