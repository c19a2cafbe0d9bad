"""Sparse pruned-search semantics (reference DAAT WAND/MaxScore/BlockMax/
SINDI, src/index/sparse/searcher/*, sindi_inverted_index.h).

The TPU analog is windowed block-max pruning (ops/sparse_ops.py
sparse_search_pruned). These tests pin the knob contracts from
sparse_index_config.h:57-203: every supported knob has an observable effect.
"""

import numpy as np
import pytest

import knowhere_tpu as kt

NB, NQ, NDIM, K = 20000, 16, 256, 10


def _ds(rows, dim=NDIM):
    ds = kt.DataSet()
    ds.set("tensor", rows)
    ds.is_sparse = True
    ds.rows = len(rows)
    ds.dim = dim
    return ds


def _gen_rows(rng, n, nnz_hi=12, topic=None):
    """Topic-clustered rows: docs in different regions use mostly-disjoint dim
    ranges (like text corpora, where most terms are selective) so window
    bounds have something to prune. A few shared 'stopword' dims overlap."""
    rws = []
    for i in range(n):
        t = topic if topic is not None else (i * 16) // max(n, 1)
        nnz = int(rng.integers(4, nnz_hi))
        local = (t * (NDIM // 16) + rng.integers(0, NDIM // 16, size=nnz)) % NDIM
        row = {int(d): float(rng.uniform(0.1, 3.0)) for d in local}
        if rng.random() < 0.3:  # shared stopword dim
            row[int(rng.integers(0, 8))] = float(rng.uniform(0.05, 0.3))
        rws.append(row)
    return rws


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(21)
    base = _gen_rows(rng, NB)
    queries = _gen_rows(rng, NQ, topic=3)
    return base, queries


def _build(base, algo="DAAT_WAND"):
    idx = kt.IndexFactory.Instance().Create(
        "SPARSE_INVERTED_INDEX", data_type="sparse"
    ).value()
    cfg = {"metric_type": "IP", "inverted_index_algo": algo}
    assert idx.Build(_ds(base), cfg) == kt.Status.success
    return idx


def _pos_sets(scores, ids):
    return [set(ids[i][scores[i] > 0].tolist()) for i in range(ids.shape[0])]


def test_pruned_equals_exact_at_ratio_ge_one(corpus):
    """With dim_max_score_ratio >= 1 and no term drop, window pruning is
    EXACT: bounds are valid, so pruned results equal the exhaustive scan."""
    base, queries = corpus
    idx = _build(base)
    c_exact = {"metric_type": "IP", "k": K, "search_algo": "TAAT_NAIVE"}
    c_wand = {"metric_type": "IP", "k": K, "search_algo": "DAAT_WAND",
              "sindi_window_size": 1024, "dim_max_score_ratio": 1.0}
    r0 = idx.Search(_ds(queries), c_exact, kt.BitsetView()).value()
    r1 = idx.Search(_ds(queries), c_wand, kt.BitsetView()).value()
    s0 = r0.distance.reshape(NQ, K); i0 = r0.ids.reshape(NQ, K)
    s1 = r1.distance.reshape(NQ, K); i1 = r1.ids.reshape(NQ, K)
    for a, b in zip(_pos_sets(s0, i0), _pos_sets(s1, i1)):
        assert a == b
    np.testing.assert_allclose(
        np.where(s0 > 0, s0, 0), np.where(s1 > 0, s1, 0), rtol=1e-5, atol=1e-5
    )
    # and pruning actually skipped windows
    stats = idx.node._last_search_stats
    scanned = stats["windows_scanned_a"] + stats["windows_scanned_b"]
    assert stats["n_windows"] > 1
    assert scanned < stats["windows_total"], stats


def test_sindi_window_size_controls_windowing(corpus):
    base, queries = corpus
    idx = _build(base)
    cfg = {"metric_type": "IP", "k": K, "search_algo": "SINDI",
           "sindi_window_size": 1024}
    r_small = idx.Search(_ds(queries), cfg, kt.BitsetView()).value()
    n_small = idx.node._last_search_stats["n_windows"]
    cfg["sindi_window_size"] = 16384
    r_big = idx.Search(_ds(queries), cfg, kt.BitsetView()).value()
    n_big = idx.node._last_search_stats["n_windows"]
    assert n_small > n_big >= 1
    # same exact results either way (window size is a layout knob)
    np.testing.assert_allclose(
        np.where(r_small.distance > 0, r_small.distance, 0),
        np.where(r_big.distance > 0, r_big.distance, 0),
        rtol=1e-5, atol=1e-5,
    )


def test_dim_max_score_ratio_changes_pruning(corpus):
    """ratio < 1 downscales cached bounds -> more aggressive skipping
    (fewer windows scanned); ratio > 1 is conservative
    (sparse_index_config.h:97-126)."""
    base, _ = corpus
    idx = _build(base)
    # cross-topic queries: many windows carry a nonzero bound near the
    # threshold, so the ratio visibly moves the phase-B frontier
    rng = np.random.default_rng(5)
    queries = []
    for _ in range(NQ):
        dims = rng.choice(NDIM, size=24, replace=False)
        queries.append({int(d): float(rng.uniform(0.5, 1.5)) for d in dims})
    cfg = {"metric_type": "IP", "k": K, "search_algo": "DAAT_WAND",
           "sindi_window_size": 1024, "dim_max_score_ratio": 0.5}
    idx.Search(_ds(queries), cfg, kt.BitsetView())
    st_low = dict(idx.node._last_search_stats)
    cfg["dim_max_score_ratio"] = 1.3
    idx.Search(_ds(queries), cfg, kt.BitsetView())
    st_high = dict(idx.node._last_search_stats)
    low = st_low["windows_scanned_a"] + st_low["windows_scanned_b"]
    high = st_high["windows_scanned_a"] + st_high["windows_scanned_b"]
    assert low < high, (st_low, st_high)


def test_refine_factor_recovers_dropped_terms(corpus):
    """With a large drop_ratio_search, refine_factor > 1 rescans the top
    candidates with the FULL query: recall vs the exact oracle must improve
    (sparse_index_config.h:84-96)."""
    base, queries = corpus
    idx = _build(base)
    exact = idx.Search(
        _ds(queries), {"metric_type": "IP", "k": K, "search_algo": "TAAT_NAIVE"},
        kt.BitsetView(),
    ).value()
    gt = exact.ids.reshape(NQ, K)

    def recall(cfg):
        r = idx.Search(_ds(queries), cfg, kt.BitsetView()).value()
        ids = r.ids.reshape(NQ, K)
        return np.mean([
            len(set(ids[i][ids[i] >= 0]) & set(gt[i][gt[i] >= 0])) / max((gt[i] >= 0).sum(), 1)
            for i in range(NQ)
        ])

    base_cfg = {"metric_type": "IP", "k": K, "search_algo": "DAAT_MAXSCORE",
                "sindi_window_size": 1024, "drop_ratio_search": 0.6}
    rec1 = recall({**base_cfg, "refine_factor": 1})
    rec8 = recall({**base_cfg, "refine_factor": 8})
    assert rec8 >= rec1, (rec1, rec8)
    assert rec8 > 0.9, rec8


def test_pruned_respects_bitset(corpus):
    base, queries = corpus
    idx = _build(base)
    rng = np.random.default_rng(2)
    filtered = np.zeros(NB, bool)
    filtered[rng.choice(NB, size=NB // 3, replace=False)] = True
    cfg = {"metric_type": "IP", "k": K, "search_algo": "DAAT_WAND",
           "sindi_window_size": 1024}
    r = idx.Search(_ds(queries), cfg, kt.BitsetView.from_bool_array(filtered)).value()
    ids = r.ids.reshape(NQ, K)
    valid = ids[ids >= 0]
    assert not filtered[valid].any()


def test_pruned_bm25(corpus):
    base, queries = corpus
    idx = kt.IndexFactory.Instance().Create(
        "SPARSE_INVERTED_INDEX", data_type="sparse"
    ).value()
    bm = {"bm25_k1": 1.2, "bm25_b": 0.75, "bm25_avgdl": 10.0}
    cfg_b = {"metric_type": "BM25", **bm}
    assert idx.Build(_ds(base), cfg_b) == kt.Status.success
    c_exact = {"metric_type": "BM25", "k": K, "search_algo": "TAAT_NAIVE", **bm}
    c_wand = {"metric_type": "BM25", "k": K, "search_algo": "BLOCK_MAX_WAND",
              "sindi_window_size": 1024, "dim_max_score_ratio": 1.0, **bm}
    r0 = idx.Search(_ds(queries), c_exact, kt.BitsetView()).value()
    r1 = idx.Search(_ds(queries), c_wand, kt.BitsetView()).value()
    s0 = r0.distance.reshape(NQ, K); i0 = r0.ids.reshape(NQ, K)
    s1 = r1.distance.reshape(NQ, K); i1 = r1.ids.reshape(NQ, K)
    for a, b in zip(_pos_sets(s0, i0), _pos_sets(s1, i1)):
        assert a == b


def test_codec_selection_roundtrip(corpus):
    """inverted_index_codec honors the reference names (flat / vbyte family /
    block_adaptive) and every choice round-trips identically."""
    base, queries = corpus
    results = {}
    for codec in ("", "block_streamvbyte", "block_adaptive"):
        idx = kt.IndexFactory.Instance().Create(
            "SPARSE_INVERTED_INDEX", data_type="sparse"
        ).value()
        cfg = {"metric_type": "IP"}
        if codec:
            cfg["inverted_index_codec"] = codec
        assert idx.Build(_ds(base[:2000]), cfg) == kt.Status.success
        bs = kt.BinarySet()
        assert idx.Serialize(bs) == kt.Status.success
        idx2 = kt.IndexFactory.Instance().Create(
            "SPARSE_INVERTED_INDEX", data_type="sparse"
        ).value()
        assert idx2.Deserialize(bs, cfg) == kt.Status.success
        r = idx2.Search(_ds(queries), {"metric_type": "IP", "k": K}, kt.BitsetView())
        results[codec] = r.value().ids.copy()
    for codec in ("block_streamvbyte", "block_adaptive"):
        np.testing.assert_array_equal(results[""], results[codec])


def test_unknown_codec_rejected(corpus):
    base, _ = corpus
    idx = kt.IndexFactory.Instance().Create(
        "SPARSE_INVERTED_INDEX", data_type="sparse"
    ).value()
    st = idx.Build(_ds(base[:100]), {"metric_type": "IP", "inverted_index_codec": "bogus"})
    assert st != kt.Status.success
