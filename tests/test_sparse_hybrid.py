"""Hybrid head/tail sparse engine (ops/sparse_ops.HybridSlab) semantics.

The default exact scorer for DAAT_*/BLOCK_MAX_*/SINDI algo names
(reference: src/index/sparse/searcher/* are pruning strategies over the same
exact scores — daat_wand.h). These tests pin:
  - exactness vs the TAAT_NAIVE exhaustive engine at drop=0 (incl. BM25)
  - the engine is what actually ran (stats tag)
  - bitset filtering, drop_ratio_search + refine_factor rescoring
  - BM25 refine rescoring uses transformed doc values (round-2 advisor)
"""

import numpy as np
import pytest

import knowhere_tpu as kt
from knowhere_tpu.ops.sparse_ops import build_hybrid_slab

NB, NQ, VOCAB, K = 6000, 24, 2000, 10


def _ds(rows, dim=VOCAB):
    ds = kt.DataSet()
    ds.set("tensor", rows)
    ds.is_sparse = True
    ds.rows = len(rows)
    ds.dim = dim
    return ds


def _zipf_rows(rng, n, avg_nnz):
    rws = []
    for _ in range(n):
        nnz = int(rng.integers(4, 2 * avg_nnz))
        dims = (rng.zipf(1.3, size=nnz).clip(1, VOCAB) - 1).astype(int)
        rws.append({int(d): float(rng.lognormal(0.0, 0.6)) for d in dims})
    return rws


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    return _zipf_rows(rng, NB, 30), _zipf_rows(rng, NQ, 15)


def _build(base, metric="IP"):
    idx = kt.IndexFactory.Instance().Create(
        "SPARSE_INVERTED_INDEX", data_type="sparse"
    ).value()
    assert idx.Build(_ds(base), {"metric_type": metric}) == kt.Status.success
    return idx


def _pos_sets(scores, ids):
    return [set(ids[i][scores[i] > 0].tolist()) for i in range(ids.shape[0])]


def test_hybrid_is_default_and_exact_ip(corpus):
    base, queries = corpus
    idx = _build(base)
    r_h = idx.Search(_ds(queries), {"metric_type": "IP", "k": K}, kt.BitsetView()).value()
    assert idx.node._last_search_stats.get("engine") == "hybrid_slab"
    r_e = idx.Search(
        _ds(queries), {"metric_type": "IP", "k": K, "search_algo": "TAAT_NAIVE"},
        kt.BitsetView(),
    ).value()
    s0, i0 = r_e.distance.reshape(NQ, K), r_e.ids.reshape(NQ, K)
    s1, i1 = r_h.distance.reshape(NQ, K), r_h.ids.reshape(NQ, K)
    for a, b in zip(_pos_sets(s0, i0), _pos_sets(s1, i1)):
        assert a == b
    np.testing.assert_allclose(
        np.where(s0 > 0, s0, 0), np.where(s1 > 0, s1, 0), rtol=2e-5, atol=2e-5
    )


def test_hybrid_exact_bm25(corpus):
    base, queries = corpus
    idx = _build(base, metric="BM25")
    bm = {"bm25_k1": 1.2, "bm25_b": 0.75, "bm25_avgdl": 30.0}
    r_h = idx.Search(_ds(queries), {"metric_type": "BM25", "k": K, **bm}, kt.BitsetView()).value()
    assert idx.node._last_search_stats.get("engine") == "hybrid_slab"
    r_e = idx.Search(
        _ds(queries),
        {"metric_type": "BM25", "k": K, "search_algo": "TAAT_NAIVE", **bm},
        kt.BitsetView(),
    ).value()
    s0, i0 = r_e.distance.reshape(NQ, K), r_e.ids.reshape(NQ, K)
    s1, i1 = r_h.distance.reshape(NQ, K), r_h.ids.reshape(NQ, K)
    for a, b in zip(_pos_sets(s0, i0), _pos_sets(s1, i1)):
        assert a == b
    np.testing.assert_allclose(
        np.where(s0 > 0, s0, 0), np.where(s1 > 0, s1, 0), rtol=2e-5, atol=2e-5
    )


def test_hybrid_bitset_filtering(corpus):
    base, queries = corpus
    idx = _build(base)
    bits = np.zeros(NB, dtype=bool)
    bits[::2] = True  # filter out even ids
    bs = kt.BitsetView(np.packbits(bits, bitorder="little"), NB)
    r = idx.Search(_ds(queries), {"metric_type": "IP", "k": K}, bs).value()
    ids = r.ids.reshape(NQ, K)
    assert idx.node._last_search_stats.get("engine") == "hybrid_slab"
    valid = ids[ids >= 0]
    assert valid.size > 0
    assert (valid % 2 == 1).all()


def test_hybrid_drop_and_refine(corpus):
    """drop_ratio_search prunes query terms; refine_factor>1 rescores the
    pool with the FULL query — recall vs drop=0 must not degrade below the
    unrefined drop run (sparse_index_config.h:84-96)."""
    base, queries = corpus
    idx = _build(base)
    r0 = idx.Search(_ds(queries), {"metric_type": "IP", "k": K}, kt.BitsetView()).value()
    gt = _pos_sets(r0.distance.reshape(NQ, K), r0.ids.reshape(NQ, K))

    def recall(cfg):
        r = idx.Search(_ds(queries), cfg, kt.BitsetView()).value()
        got = _pos_sets(r.distance.reshape(NQ, K), r.ids.reshape(NQ, K))
        return np.mean([len(a & b) / max(len(a), 1) for a, b in zip(gt, got)])

    rec_drop = recall({"metric_type": "IP", "k": K, "drop_ratio_search": 0.5})
    rec_ref = recall({
        "metric_type": "IP", "k": K, "drop_ratio_search": 0.5, "refine_factor": 4
    })
    assert rec_ref >= rec_drop - 1e-9
    assert rec_ref > 0.7


def test_bm25_refine_uses_transformed_values(corpus):
    """With BM25 + drop + refine, the rescored ordering must match the
    exhaustive BM25 ordering on the candidate pool — i.e. the rescore applies
    the BM25 doc-value transform, not raw tf (round-2 advisor finding)."""
    base, queries = corpus
    idx = _build(base, metric="BM25")
    bm = {"bm25_k1": 1.2, "bm25_b": 0.75, "bm25_avgdl": 30.0}
    r = idx.Search(
        _ds(queries),
        {"metric_type": "BM25", "k": K, "drop_ratio_search": 0.4,
         "refine_factor": 4, **bm},
        kt.BitsetView(),
    ).value()
    s1, i1 = r.distance.reshape(NQ, K), r.ids.reshape(NQ, K)
    # exhaustive BM25 reference scores
    r_e = idx.Search(
        _ds(queries),
        {"metric_type": "BM25", "k": max(K * 8, 64), "search_algo": "TAAT_NAIVE", **bm},
        kt.BitsetView(),
    ).value()
    kb = max(K * 8, 64)
    se, ie = r_e.distance.reshape(NQ, kb), r_e.ids.reshape(NQ, kb)
    # every refined result id's score must equal its exhaustive BM25 score
    for qi in range(NQ):
        lut = {int(d): float(s) for d, s in zip(ie[qi], se[qi]) if d >= 0 and s > 0}
        for d, s in zip(i1[qi], s1[qi]):
            if d >= 0 and s > 0 and int(d) in lut:
                assert abs(lut[int(d)] - float(s)) <= 1e-3 * max(1.0, abs(s)), (
                    f"query {qi} doc {d}: refined {s} vs exhaustive {lut[int(d)]}"
                )


def test_slab_budget_cap():
    """The slab F auto-sizes to the element budget — a tiny budget forces a
    small F with the remainder in tail postings; results stay exact."""
    rng = np.random.default_rng(5)
    rows = _zipf_rows(rng, 512, 20)
    h_small = build_hybrid_slab(rows, budget_bytes=512 * 128 * 4 + 1)
    h_big = build_hybrid_slab(rows, budget_bytes=512 << 20)
    assert h_small is not None and h_big is not None
    assert h_small.F <= h_big.F
    assert h_small.head_nnz + len(h_small.tail.vals) == h_small.total_nnz


def test_resident_compression_modes(corpus, monkeypatch):
    """14b resident-compression, default ON: tail ids live as a fixed
    ceil(log2(nb))-bit packed u32 stream decoded in the gather
    (ops/bitpack.py), values as bf16 with an exact top-pool rescore gate —
    so results must match the f32/u32 opt-out build EXACTLY (ids and
    scores), not just overlap."""
    import jax.numpy as jnp

    from knowhere_tpu.ops.bitpack import width_for

    base, queries = corpus
    # opt-out build = uncompressed reference
    monkeypatch.setenv("KNOWHERE_SPARSE_PACKED_IDS", "0")
    monkeypatch.setenv("KNOWHERE_SPARSE_RESIDENT_BF16", "0")
    idx0 = _build(base)
    r0 = idx0.Search(_ds(queries), {"metric_type": "IP", "k": K}, kt.BitsetView()).value()
    h0 = idx0.node._caches.get("hybrid")
    assert h0 is not None and h0[1].dtype == jnp.uint16  # legacy u16 ids
    assert h0[0].tail_bits == 0

    # default build = packed ids + bf16 values
    monkeypatch.delenv("KNOWHERE_SPARSE_PACKED_IDS")
    monkeypatch.delenv("KNOWHERE_SPARSE_RESIDENT_BF16")
    idx1 = _build(base)
    r1 = idx1.Search(_ds(queries), {"metric_type": "IP", "k": K}, kt.BitsetView()).value()
    h1 = idx1.node._caches.get("hybrid")
    assert h1 is not None and h1[1].dtype == jnp.uint32  # packed stream
    nb = h1[0].nb
    assert h1[0].tail_bits == width_for(nb)
    assert h1[0].vals_bf16
    # packed stream is smaller than even the u16 ids whenever bits < 16
    n_tail = len(h1[0].tail.doc_ids)
    assert h1[1].nbytes <= 2 * n_tail + 8 or width_for(nb) > 16
    slot = idx1.node._caches.get(("hvals", "ip"))
    assert slot is not None and slot[0].dtype == jnp.bfloat16

    i0, i1 = r0.ids.reshape(NQ, K), r1.ids.reshape(NQ, K)
    s0, s1 = r0.distance.reshape(NQ, K), r1.distance.reshape(NQ, K)
    assert (i0 == i1).mean() > 0.99  # exact ties may swap order
    np.testing.assert_allclose(np.sort(s1, 1), np.sort(s0, 1), rtol=1e-5)
