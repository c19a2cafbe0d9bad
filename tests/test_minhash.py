"""MINHASH_LSH internals: band KV tables, Bloom prefilter, batch search,
serialized tables (reference minhash_lsh.h:56-149, 283-294)."""

import numpy as np
import pytest

import knowhere_tpu as kt

DIM_BITS, WIDTH, NB, NQ, K = 32 * 16, 32, 2000, 8, 5


def _pack(elems: np.ndarray) -> np.ndarray:
    """(n, n_elem) uint32-valued -> packed bin1 rows."""
    n = elems.shape[0]
    u32 = elems.astype(np.uint32)
    return u32.view(np.uint8).reshape(n, -1)


def _ds(rows):
    ds = kt.DataSet()
    ds.set("tensor", rows)
    ds.rows = rows.shape[0]
    ds.dim = DIM_BITS
    return ds


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(9)
    n_elem = DIM_BITS // WIDTH
    base = rng.integers(0, 50, size=(NB, n_elem), dtype=np.uint64)
    # queries = copies of base rows with a few mutated elements, so LSH bands
    # collide and the exact rerank has real gradations
    q_src = rng.integers(0, NB, size=NQ)
    queries = base[q_src].copy()
    for i in range(NQ):
        mut = rng.integers(0, n_elem, size=2)
        queries[i, mut] += 1
    return _pack(base), _pack(queries), q_src


def _build(base, **extra):
    cfg = {"metric_type": "MHJACCARD", "mh_element_bit_width": WIDTH,
           "mh_lsh_band": 8, **extra}
    idx = kt.IndexFactory.Instance().Create("MINHASH_LSH", data_type="bin1").value()
    assert idx.Build(_ds(base), cfg) == kt.Status.success
    return idx


def test_search_finds_source_row(corpus):
    base, queries, q_src = corpus
    idx = _build(base)
    cfg = {"metric_type": "MHJACCARD", "k": K, "mh_element_bit_width": WIDTH}
    r = idx.Search(_ds(queries), cfg, kt.BitsetView())
    ids = r.value().ids.reshape(NQ, K)
    hits = np.mean([q_src[i] in set(ids[i]) for i in range(NQ)])
    assert hits >= 0.7, hits  # band collisions survive 2 mutated elements


def test_batch_search_matches_sequential(corpus):
    base, queries, _ = corpus
    idx = _build(base)
    cfg = {"metric_type": "MHJACCARD", "k": K, "mh_element_bit_width": WIDTH}
    r_seq = idx.Search(_ds(queries), cfg, kt.BitsetView()).value()
    r_bat = idx.Search(_ds(queries), {**cfg, "mh_lsh_batch_search": True}, kt.BitsetView()).value()
    np.testing.assert_array_equal(r_seq.ids, r_bat.ids)
    np.testing.assert_allclose(r_seq.distance, r_bat.distance)


def test_bloom_prefilter_skips_absent_hashes(corpus):
    """Queries whose band hashes are not in the index skip the KV probe
    entirely (bloom says absent) — the prefilter observably fires."""
    base, _, _ = corpus
    idx = _build(base)
    rng = np.random.default_rng(77)
    # random signatures share no band with the corpus w.h.p.
    alien = _pack(rng.integers(1 << 20, 1 << 30, size=(NQ, DIM_BITS // WIDTH), dtype=np.uint64))
    cfg = {"metric_type": "MHJACCARD", "k": K, "mh_element_bit_width": WIDTH}
    r = idx.Search(_ds(alien), cfg, kt.BitsetView())
    assert r.has_value()
    stats = idx.node._last_search_stats
    assert stats["bloom_skipped"] > 0, stats
    assert (r.value().ids.reshape(NQ, K) == -1).all()


def test_shared_bloom_filter(corpus):
    base, queries, q_src = corpus
    idx = _build(base, mh_lsh_shared_bloom_filter=True,
                 mh_lsh_bloom_false_positive_prob=0.001)
    cfg = {"metric_type": "MHJACCARD", "k": K, "mh_element_bit_width": WIDTH}
    r = idx.Search(_ds(queries), cfg, kt.BitsetView())
    ids = r.value().ids.reshape(NQ, K)
    hits = np.mean([q_src[i] in set(ids[i]) for i in range(NQ)])
    assert hits >= 0.7, hits
    assert len(idx.node._blooms) == 1  # one shared filter, not per-band


def test_serialize_loads_tables_without_rebuild(corpus):
    base, queries, _ = corpus
    idx = _build(base)
    cfg = {"metric_type": "MHJACCARD", "k": K, "mh_element_bit_width": WIDTH}
    r0 = idx.Search(_ds(queries), cfg, kt.BitsetView()).value()
    bs = kt.BinarySet()
    assert idx.Serialize(bs) == kt.Status.success
    idx2 = kt.IndexFactory.Instance().Create("MINHASH_LSH", data_type="bin1").value()
    assert idx2.Deserialize(bs, cfg) == kt.Status.success
    # tables came from the blob — no rebuild happened or pending
    assert idx2.node._tables_dirty is False
    assert idx2.node._band_hash is not None
    assert len(idx2.node._blooms) == idx2.node._n_band
    r1 = idx2.Search(_ds(queries), cfg, kt.BitsetView()).value()
    np.testing.assert_array_equal(r0.ids, r1.ids)


def test_bitset_filtering(corpus):
    base, queries, q_src = corpus
    idx = _build(base)
    filtered = np.zeros(NB, bool)
    filtered[q_src] = True  # filter out every query's source row
    cfg = {"metric_type": "MHJACCARD", "k": K, "mh_element_bit_width": WIDTH}
    r = idx.Search(_ds(queries), cfg, kt.BitsetView.from_bool_array(filtered))
    ids = r.value().ids.reshape(NQ, K)
    valid = ids[ids >= 0]
    assert not filtered[valid].any()
