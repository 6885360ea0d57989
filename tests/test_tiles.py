"""Tiles-mode (streaming dense doc tiles) search tests vs the exact oracle
and vs the gather-mode engine."""

import numpy as np
import pytest

from seismic_tpu import Configuration, SearchParams, TpuLayout
from seismic_tpu.build.builder import build_index
from seismic_tpu.search.engine import pad_queries, search_batch
from seismic_tpu.search.exact import exact_search_numpy
from tests.conftest import make_random_dataset, make_random_queries


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    ds = make_random_dataset(rng, n_docs=400, dim=600, min_nnz=15,
                             max_nnz=50, seed=42)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256))
    arrays = build_index(ds, cfg)
    qc, qv = make_random_queries(np.random.default_rng(1), n_queries=16,
                                 dim=600, min_nnz=8, max_nnz=30)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    _, gt_i = exact_search_numpy(ds, q_comps, q_vals, k=10)
    return ds, arrays, q_comps, q_vals, gt_i


def _recall(ids, gt_ids, k=10):
    hits = tot = 0
    for row, gt in zip(ids, gt_ids):
        r = {int(d) for d in row[:k] if d >= 0}
        g = {int(d) for d in gt[:k] if d >= 0}
        hits += len(r & g)
        tot += len(g)
    return hits / max(tot, 1)


def test_tiles_structures_built(setup):
    _, arrays, _, _, _ = setup
    assert arrays.doc_tiles is not None
    assert arrays.doc_tiles.shape[1] == 256
    assert arrays.list_post_start is not None
    # list ranges cover the posting array without overlap
    total = int(arrays.list_len.sum())
    assert total == int(
        sum(arrays.block_len[: int(arrays.list_n_blocks.sum())])
    )


def test_tiles_full_lists_recall(setup):
    ds, arrays, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device()
    params = SearchParams(k=10, query_cut=10, doc_mode="tiles",
                          full_lists=True)
    scores, ids = search_batch(dev, q_comps, q_vals, params)
    assert _recall(ids, gt_i) >= 0.95
    # scores close to exact dots (u8 quantization + vocab truncation)
    for b in range(4):
        for j in range(5):
            d = int(ids[b, j])
            if d < 0:
                continue
            comps, vals = ds.get(d)
            qd = np.zeros(ds.dim + 1, np.float32)
            m = q_comps[b] < ds.dim
            qd[q_comps[b][m]] = q_vals[b][m]
            exact = float(qd[comps] @ vals)
            assert abs(exact - scores[b, j]) < 0.05 * max(exact, 1.0)


def test_tiles_no_duplicates(setup):
    _, arrays, q_comps, q_vals, _ = setup
    dev = arrays.to_device()
    params = SearchParams(k=10, query_cut=10, doc_mode="tiles",
                          full_lists=True)
    _, ids = search_batch(dev, q_comps, q_vals, params)
    for row in ids:
        real = [int(d) for d in row if d >= 0]
        assert len(real) == len(set(real))


def test_tiles_block_pruned_mode(setup):
    _, arrays, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device()
    full = SearchParams(k=10, query_cut=10, doc_mode="tiles",
                        full_lists=True)
    pruned = SearchParams(k=10, query_cut=10, doc_mode="tiles",
                          full_lists=False, block_budget=0)
    _, ids_full = search_batch(dev, q_comps, q_vals, full)
    _, ids_pruned = search_batch(dev, q_comps, q_vals, pruned,
                                 heap_factor=0.0)
    # with no budget limit and hf=0, pruned mode should match full mode
    r_full, r_pruned = _recall(ids_full, gt_i), _recall(ids_pruned, gt_i)
    assert r_pruned >= r_full - 0.02
    # aggressive pruning degrades gracefully
    hard = SearchParams(k=10, query_cut=10, doc_mode="tiles",
                        full_lists=False, block_budget=8)
    _, ids_hard = search_batch(dev, q_comps, q_vals, hard, heap_factor=1.0)
    assert 0.3 <= _recall(ids_hard, gt_i) <= r_pruned + 1e-9


def test_tiles_matches_gather_mode(setup):
    _, arrays, q_comps, q_vals, _ = setup
    dev = arrays.to_device()
    tiles = SearchParams(k=10, query_cut=10, doc_mode="tiles",
                         full_lists=True)
    gather = SearchParams(k=10, query_cut=10, doc_mode="gather",
                          block_budget=0)
    s_t, i_t = search_batch(dev, q_comps, q_vals, tiles)
    s_g, i_g = search_batch(dev, q_comps, q_vals, gather, heap_factor=0.0)
    # same candidates reachable; ranking may differ slightly due to u8
    agree = np.mean([
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
        / max(len(set(b[b >= 0].tolist())), 1)
        for a, b in zip(i_t, i_g)
    ])
    assert agree >= 0.9


def test_tiles_score_cut_truncation(setup):
    _, arrays, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device()
    lo = SearchParams(k=10, query_cut=10, doc_mode="tiles",
                      full_lists=True, score_cut=4)
    hi = SearchParams(k=10, query_cut=10, doc_mode="tiles",
                      full_lists=True, score_cut=64)
    _, ids_lo = search_batch(dev, q_comps, q_vals, lo)
    _, ids_hi = search_batch(dev, q_comps, q_vals, hi)
    assert _recall(ids_hi, gt_i) >= _recall(ids_lo, gt_i)


def test_large_vocab_int32_fallback():
    """dim >= 32768 keeps int32 vocab/overflow ids (LV variant layout)."""
    rng = np.random.default_rng(4)
    ds = make_random_dataset(rng, n_docs=80, dim=40000, min_nnz=10,
                             max_nnz=30, seed=13)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=128))
    arrays = build_index(ds, cfg)
    assert arrays.list_vocab.dtype == np.int32
    assert arrays.tile_ovf_comps.dtype == np.int32
    # queries = doc vectors (random queries share nothing at this sparsity)
    qc = [ds.get(i)[0] for i in range(4)]
    qv = [ds.get(i)[1] for i in range(4)]
    q_comps, q_vals = pad_queries(qc, qv, 32)
    gt_s, gt_i = exact_search_numpy(ds, q_comps, q_vals, k=5)
    # at this sparsity only positive-score GT entries are meaningful
    gt_i = np.where(gt_s > 1e-6, gt_i, -1)
    params = SearchParams(k=5, query_cut=32, doc_mode="tiles",
                          full_lists=True)
    _, ids = search_batch(arrays.to_device(), q_comps, q_vals, params)
    assert _recall(ids, gt_i, 5) >= 0.9


def test_small_vocab_int16():
    rng = np.random.default_rng(6)
    ds = make_random_dataset(rng, n_docs=80, dim=500, seed=17)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=128))
    arrays = build_index(ds, cfg)
    assert arrays.list_vocab.dtype == np.int16
    assert arrays.tile_ovf_comps.dtype == np.int16


def test_pallas_engine_path_matches_xla(setup):
    """Full search through the Pallas fused scorer (interpret mode on CPU)
    equals the XLA tiles path."""
    _, arrays, q_comps, q_vals, gt_i = setup
    # B*QC must be a multiple of 8 for the Pallas grid
    qc8, qv8 = q_comps[:8], q_vals[:8]
    dev_x = arrays.to_device()
    dev_p = arrays.to_device(pallas_tiles=True)
    assert dev_p.doc_tiles is None  # packed tiles dropped on device
    px = SearchParams(k=10, query_cut=8, doc_mode="tiles", full_lists=True)
    pp = SearchParams(k=10, query_cut=8, doc_mode="tiles", full_lists=True,
                      use_pallas=True)
    s_x, i_x = search_batch(dev_x, qc8, qv8, px)
    s_p, i_p = search_batch(dev_p, qc8, qv8, pp)
    assert (i_x == i_p).mean() > 0.95
    finite = np.isfinite(s_x) & np.isfinite(s_p)
    assert np.allclose(s_x[finite], s_p[finite], rtol=1e-3, atol=1e-2)
