"""Fixed-width bitpacked device arrays with decode-on-gather.

Resident posting compression for the sparse tail store (reference keeps
postings bitpacked in memory/mmap: src/index/sparse/block_inverted_index.h
+ src/index/sparse/codec/simd_bitpacking*). The reference's variable-rate
delta codecs trade random access for density and decode on the CPU per
block; a TPU engine consumes postings through flat XLA gathers, so the
TPU-honest codec is FIXED-width packing at ceil(log2(nb)) bits per doc id:
random access is preserved (element i lives at bits [i*b, (i+1)*b)) and the
decode is two u32 gathers + shifts fused into the consuming kernel.

Density: nb=200k -> 18 bits/id vs 32 (u32) or 16 (u16, only when nb<=65536);
nb=10M -> 24 bits vs 32. Combined with bf16 values the tail posting costs
bits/8 + 2 bytes (e.g. 4.25 B at nb=200k vs the reference's ~2-4 B/posting
after delta+bitpack+quantization — within the 2x contract).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def width_for(n_values: int) -> int:
    """Bits needed to represent ids in [0, n_values)."""
    return max(1, int(np.ceil(np.log2(max(int(n_values), 2)))))


def pack_fixed(a: np.ndarray, bits: int) -> np.ndarray:
    """Pack unsigned ints < 2**bits into a little-endian u32 bitstream.

    Element i occupies bits [i*bits, (i+1)*bits). One spare word is
    appended so decode-on-gather can always load word w+1.
    """
    a = np.ascontiguousarray(a, dtype=np.uint64)
    if bits < 1 or bits > 32:
        raise ValueError(f"bits must be in [1, 32], got {bits}")
    if a.size and int(a.max()) >> bits:
        raise ValueError("value does not fit the requested bit width")
    n = a.size
    nwords = (n * bits + 31) // 32 + 1
    out = np.zeros(nwords, np.uint32)
    if n == 0:
        return out
    bitpos = np.arange(n, dtype=np.int64) * bits
    w = (bitpos >> 5).astype(np.int64)
    ofs = (bitpos & 31).astype(np.uint64)
    shifted = a << ofs  # fits u64: bits + ofs <= 32 + 31
    np.bitwise_or.at(out, w, (shifted & 0xFFFFFFFF).astype(np.uint32))
    np.bitwise_or.at(out, w + 1, (shifted >> np.uint64(32)).astype(np.uint32))
    return out


def unpack_gather(packed, idx, bits: int):
    """Gather elements `idx` from a pack_fixed stream ON DEVICE -> uint32.

    Two word gathers + shifts; `bits` is static (baked into the jit).
    Safe for streams up to 2**31 total bits (int32 bit positions).
    """
    bitpos = idx.astype(jnp.uint32) * jnp.uint32(bits)
    w = (bitpos >> 5).astype(jnp.int32)
    ofs = bitpos & jnp.uint32(31)
    lo = jnp.take(packed, w)
    hi = jnp.take(packed, w + 1)
    mask = jnp.uint32(0xFFFFFFFF) if bits == 32 else jnp.uint32((1 << bits) - 1)
    lo_part = lo >> ofs
    # ofs == 0 would shift hi by 32 (undefined in XLA); the where discards it
    hi_part = jnp.where(ofs == 0, jnp.uint32(0), hi << (jnp.uint32(32) - ofs))
    return (lo_part | hi_part) & mask


def unpack_all(packed: np.ndarray, n: int, bits: int) -> np.ndarray:
    """Host-side full decode (serialization / oracle checks) -> uint32."""
    if n == 0:
        return np.zeros(0, np.uint32)
    bitpos = np.arange(n, dtype=np.int64) * bits
    w = bitpos >> 5
    ofs = (bitpos & 31).astype(np.uint64)
    lo = packed[w].astype(np.uint64)
    hi = packed[w + 1].astype(np.uint64)
    mask = np.uint64((1 << bits) - 1)
    return (((lo | (hi << np.uint64(32))) >> ofs) & mask).astype(np.uint32)
