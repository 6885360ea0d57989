"""End-to-end index build + search tests (oracle: exact brute force).

Follows the reference test recipe: seeded random data + brute-force oracle +
tolerance (SURVEY.md §4, reference quantized_summary.rs:519-598), plus the
toy-dataset golden flow.
"""

import numpy as np
import pytest

from seismic_tpu import (
    Configuration,
    FixedSizeBlocking,
    FixedSizePruning,
    FixedSizeSummarization,
    SearchParams,
    TpuLayout,
)
from seismic_tpu.build.builder import build_index
from seismic_tpu.search.engine import pad_queries, search_batch
from seismic_tpu.search.exact import exact_search_numpy
from seismic_tpu.types import IndexArrays
from tests.conftest import make_random_dataset, make_random_queries


def _recall(ids, gt_ids, k):
    hits = tot = 0
    for row, gt in zip(ids, gt_ids):
        r = {int(d) for d in row[:k] if d >= 0}
        g = {int(d) for d in gt[:k] if d >= 0}
        hits += len(r & g)
        tot += len(g)
    return hits / max(tot, 1)


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(0)
    ds = make_random_dataset(rng, n_docs=400, dim=600, min_nnz=15,
                             max_nnz=50, seed=42)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256))
    arrays = build_index(ds, cfg)
    qc, qv = make_random_queries(np.random.default_rng(1), n_queries=16,
                                 dim=600, min_nnz=8, max_nnz=30)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    gt_s, gt_i = exact_search_numpy(ds, q_comps, q_vals, k=10)
    return ds, arrays, q_comps, q_vals, gt_s, gt_i


def test_recall_dense_mode(small_index):
    ds, arrays, q_comps, q_vals, gt_s, gt_i = small_index
    dev = arrays.to_device()
    params = SearchParams(k=10, query_cut=10, block_budget=0,
                          block_mode="dense")
    scores, ids = search_batch(dev, q_comps, q_vals, params, heap_factor=0.0)
    assert _recall(ids, gt_i, 10) >= 0.95
    # returned scores must equal exact dots of returned docs
    for b in range(4):
        for j in range(10):
            d = int(ids[b, j])
            if d < 0:
                continue
            comps, vals = ds.get(d)
            qd = np.zeros(ds.dim + 1, np.float32)
            qm = q_comps[b] < ds.dim
            qd[q_comps[b][qm]] = q_vals[b][qm]
            exact = float(qd[comps] @ vals)
            assert abs(exact - scores[b, j]) < 1e-3


def test_dense_matches_summary_mode(small_index):
    _, arrays, q_comps, q_vals, _, _ = small_index
    dev = arrays.to_device()
    for hf in (0.0, 0.8):
        p1 = SearchParams(k=10, query_cut=8, block_budget=32,
                          block_mode="dense")
        p2 = SearchParams(k=10, query_cut=8, block_budget=32,
                          block_mode="summary")
        s1, i1 = search_batch(dev, q_comps, q_vals, p1, heap_factor=hf)
        s2, i2 = search_batch(dev, q_comps, q_vals, p2, heap_factor=hf)
        # same candidates (vocab cap did not truncate at this scale)
        assert (i1 == i2).mean() > 0.9


def test_no_duplicate_results(small_index):
    _, arrays, q_comps, q_vals, _, _ = small_index
    dev = arrays.to_device()
    params = SearchParams(k=10, query_cut=10, block_budget=0)
    _, ids = search_batch(dev, q_comps, q_vals, params, heap_factor=0.0)
    for row in ids:
        real = [int(d) for d in row if d >= 0]
        assert len(real) == len(set(real))


def test_heap_factor_monotone(small_index):
    """Higher heap_factor prunes more -> recall can only drop."""
    _, arrays, q_comps, q_vals, gt_s, gt_i = small_index
    dev = arrays.to_device()
    params = SearchParams(k=10, query_cut=10, block_budget=32)
    recalls = []
    for hf in (0.0, 0.7, 1.1):
        _, ids = search_batch(dev, q_comps, q_vals, params, heap_factor=hf)
        recalls.append(_recall(ids, gt_i, 10))
    assert recalls[0] >= recalls[1] >= recalls[2] - 1e-9
    assert recalls[0] >= 0.9


def test_block_budget_controls_work(small_index):
    _, arrays, q_comps, q_vals, gt_s, gt_i = small_index
    dev = arrays.to_device()
    lo = SearchParams(k=10, query_cut=10, block_budget=4)
    hi = SearchParams(k=10, query_cut=10, block_budget=64)
    _, ids_lo = search_batch(dev, q_comps, q_vals, lo, heap_factor=0.0)
    _, ids_hi = search_batch(dev, q_comps, q_vals, hi, heap_factor=0.0)
    assert _recall(ids_hi, gt_i, 10) >= _recall(ids_lo, gt_i, 10)


def test_query_cut_effect(small_index):
    _, arrays, q_comps, q_vals, gt_s, gt_i = small_index
    dev = arrays.to_device()
    r = []
    for qc in (2, 10):
        params = SearchParams(k=10, query_cut=qc, block_budget=0)
        _, ids = search_batch(dev, q_comps, q_vals, params, heap_factor=0.0)
        r.append(_recall(ids, gt_i, 10))
    assert r[1] >= r[0]


def test_save_load_roundtrip(small_index, tmp_path):
    _, arrays, q_comps, q_vals, _, _ = small_index
    p = arrays.save(str(tmp_path / "idx"))
    back = IndexArrays.load(p)
    params = SearchParams(k=10, query_cut=10, block_budget=32)
    s1, i1 = search_batch(arrays.to_device(), q_comps, q_vals, params)
    s2, i2 = search_batch(back.to_device(), q_comps, q_vals, params)
    assert np.array_equal(i1, i2)
    assert np.allclose(s1, s2)
    assert back.config is not None
    assert back.config.layout.max_block_len == 16


def test_u8_value_variant(small_index):
    ds, _, q_comps, q_vals, gt_s, gt_i = small_index
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256))
    arrays = build_index(ds, cfg, value_dtype="u8")
    assert arrays.fwd_vals.dtype == np.uint8
    dev = arrays.to_device()
    params = SearchParams(k=10, query_cut=10, block_budget=0)
    scores, ids = search_batch(dev, q_comps, q_vals, params, heap_factor=0.0)
    # u8 quantization costs a little accuracy but recall should hold
    assert _recall(ids, gt_i, 10) >= 0.9


def test_fixed_strategies_build_and_search(small_index):
    ds, _, q_comps, q_vals, gt_s, gt_i = small_index
    cfg = Configuration(
        pruning=FixedSizePruning(n_postings=64),
        blocking=FixedSizeBlocking(block_size=8),
        summarization=FixedSizeSummarization(n_components=64),
        layout=TpuLayout(max_block_len=16, summary_vocab_cap=256),
    )
    arrays = build_index(ds, cfg)
    dev = arrays.to_device()
    params = SearchParams(k=10, query_cut=10, block_budget=0)
    _, ids = search_batch(dev, q_comps, q_vals, params, heap_factor=0.0)
    assert _recall(ids, gt_i, 10) >= 0.7


def test_knn_refinement_improves_recall():
    rng = np.random.default_rng(3)
    ds = make_random_dataset(rng, n_docs=300, dim=400, min_nnz=12,
                             max_nnz=40, seed=77)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256))
    arrays = build_index(ds, cfg)
    dev = arrays.to_device()
    from seismic_tpu.search.knn import build_knn, load_knn, save_knn

    graph = build_knn(arrays, dev, nknn=8, batch_size=64)
    assert graph.shape == (300, 8)
    arrays.knn = graph
    dev = arrays.to_device()

    qc, qv = make_random_queries(np.random.default_rng(5), n_queries=12,
                                 dim=400)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    _, gt_i = exact_search_numpy(ds, q_comps, q_vals, k=10)

    # deliberately starved search: low query_cut
    base = SearchParams(k=10, query_cut=2, block_budget=8)
    refined = SearchParams(k=10, query_cut=2, block_budget=8, n_knn=8)
    _, ids0 = search_batch(dev, q_comps, q_vals, base, heap_factor=0.9)
    _, ids1 = search_batch(dev, q_comps, q_vals, refined, heap_factor=0.9)
    r0, r1 = _recall(ids0, gt_i, 10), _recall(ids1, gt_i, 10)
    assert r1 >= r0
    assert r1 > 0.5

    # save / load / truncate (reference: load_knn(path, nknn))
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = save_knn(graph, os.path.join(td, "g"))
        back = load_knn(p)
        assert np.array_equal(back, graph)
        trunc = load_knn(p, nknn=3)
        assert trunc.shape == (300, 3)
        assert np.array_equal(trunc, graph[:, :3])
        with pytest.raises(ValueError):
            load_knn(p, nknn=99)


def test_rescore_doc_mode_matches_gather(small_index):
    """doc_mode='rescore' (memory-parity path: exact-rescore every
    surviving block's candidates, no tiles/sketches) must agree with
    doc_mode='gather' at the same block budget — both score the same
    candidate set exactly."""
    import numpy as np

    from seismic_tpu.search.engine import SearchParams, search_batch

    ds, arrays, q_comps, q_vals, gt_s, gt_i = small_index
    dev = arrays.to_device()
    base = dict(k=10, query_cut=10, block_budget=32, block_mode="dense",
                cand_budget=0)
    pg = SearchParams(**base, doc_mode="gather")
    pr = SearchParams(**base, doc_mode="rescore", dedup_pool=128)
    s_g, i_g = search_batch(dev, q_comps, q_vals, pg, heap_factor=0.0)
    s_r, i_r = search_batch(dev, q_comps, q_vals, pr, heap_factor=0.0)
    for b in range(len(i_g)):
        got = {int(d): float(s) for s, d in zip(s_r[b], i_r[b]) if d >= 0}
        want = {int(d): float(s) for s, d in zip(s_g[b], i_g[b]) if d >= 0}
        shared = set(got) & set(want)
        assert len(shared) >= 8
        for d in shared:
            assert abs(got[d] - want[d]) < 1e-3 * max(1.0, abs(want[d]))
