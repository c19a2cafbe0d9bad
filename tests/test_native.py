"""Native runtime (C++ codecs/IO via ctypes) vs numpy fallbacks
(reference coverage model: codec round-trips in tests/ut/test_sparse*.cc)."""

import numpy as np
import pytest

from knowhere_tpu import native


class TestNativeCodecs:
    def test_library_builds(self):
        # the image ships g++; the native path must be live, not the fallback
        assert native.available()

    def test_posting_roundtrip(self):
        rng = np.random.default_rng(0)
        ids = np.unique(rng.integers(0, 1_000_000, size=5000)).astype(np.uint32)
        blob = native.encode_postings(ids)
        assert len(blob) < ids.nbytes  # delta+varint must actually compress
        out = native.decode_postings(blob, len(ids))
        np.testing.assert_array_equal(out, ids.astype(np.int64))

    def test_posting_empty_and_single(self):
        np.testing.assert_array_equal(
            native.decode_postings(native.encode_postings(np.array([42], np.uint32)), 1), [42]
        )

    def test_bitpack_roundtrip(self):
        rng = np.random.default_rng(1)
        vals = rng.integers(0, 1 << 17, size=4096).astype(np.uint32)
        blob, bits = native.bitpack(vals)
        assert bits <= 17
        out = native.bitunpack(blob, len(vals), bits)
        np.testing.assert_array_equal(out, vals)

    def test_popcount(self):
        rng = np.random.default_rng(2)
        buf = rng.integers(0, 256, size=100_003, dtype=np.uint8)
        assert native.popcount(buf) == int(np.unpackbits(buf).sum())

    def test_gather_rows(self, tmp_path):
        rng = np.random.default_rng(3)
        data = rng.standard_normal((500, 16)).astype(np.float32)
        path = str(tmp_path / "rows.bin")
        with open(path, "wb") as f:
            f.write(b"HDR!")  # 4-byte header offset
            data.tofile(f)
        ids = np.array([3, 499, 0, 77])
        rows = native.gather_rows(path, 4, 64, ids)
        np.testing.assert_array_equal(rows.view(np.float32).reshape(4, 16), data[ids])


def test_gather_rows_mt_matches_single():
    import numpy as np
    import tempfile, os
    from knowhere_tpu.native import gather_rows, gather_rows_mt

    rows = np.random.default_rng(3).integers(0, 256, size=(512, 64)).astype(np.uint8)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "rows.bin")
        rows.tofile(path)
        ids = np.array([5, 0, 511, 42, 42], np.int64)
        a = gather_rows(path, 0, 64, ids)
        b = gather_rows_mt(path, 0, 64, ids, n_threads=4)
        if b is not None:  # native lib present
            assert np.array_equal(a, b)
