"""Multi-chip sharded search on the 8-device virtual CPU mesh: sharded
results must match a single-chip run over the same collection."""

import numpy as np
import pytest

import jax

from seismic_tpu import Configuration, SearchParams, TpuLayout
from seismic_tpu.build.builder import build_index
from seismic_tpu.parallel.mesh import make_mesh
from seismic_tpu.parallel.sharded import ShardedIndex
from seismic_tpu.search.engine import pad_queries, search_batch
from seismic_tpu.search.exact import exact_search_numpy
from tests.conftest import make_random_dataset, make_random_queries


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    ds = make_random_dataset(rng, n_docs=320, dim=500, min_nnz=12,
                             max_nnz=40, seed=123)
    cfg = Configuration(
        layout=TpuLayout(max_block_len=16, summary_vocab_cap=256,
                         max_doc_nnz=64)
    )
    qc, qv = make_random_queries(np.random.default_rng(2), n_queries=8,
                                 dim=500)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    return ds, cfg, q_comps, q_vals


def test_sharded_matches_exact_recall(setup):
    ds, cfg, q_comps, q_vals = setup
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(n_docs_shards=4, n_data=2)
    sharded = ShardedIndex.build(ds, mesh, cfg)
    params = SearchParams(k=10, query_cut=10, block_budget=0)
    scores, ids = sharded.search_batch(q_comps, q_vals, params,
                                       heap_factor=0.0)
    _, gt_i = exact_search_numpy(ds, q_comps, q_vals, k=10)
    hits = sum(
        len(set(map(int, r[r >= 0])) & set(map(int, g[g >= 0])))
        for r, g in zip(ids, gt_i)
    )
    tot = sum(len(set(map(int, g[g >= 0]))) for g in gt_i)
    assert hits / tot >= 0.95


def test_sharded_deterministic_across_shardings(setup):
    """2-shard and 4-shard runs must return identical results (deterministic
    tie-breaking by global doc id, SURVEY.md §5)."""
    ds, cfg, q_comps, q_vals = setup
    params = SearchParams(k=10, query_cut=10, block_budget=0)
    results = []
    for n_shards in (2, 4):
        mesh = make_mesh(n_docs_shards=n_shards, n_data=1)
        sharded = ShardedIndex.build(ds, mesh, cfg)
        s, i = sharded.search_batch(q_comps, q_vals, params, heap_factor=0.0)
        results.append((s, i))
    (s2, i2), (s4, i4) = results
    assert np.allclose(s2, s4, atol=1e-4)
    assert (i2 == i4).mean() > 0.95  # ties among equal f32 scores may flip


def test_sharded_scores_match_global_exact(setup):
    """Sharded search scores equal single-index scores for the same docs."""
    ds, cfg, q_comps, q_vals = setup
    mesh = make_mesh(n_docs_shards=4, n_data=1)
    sharded = ShardedIndex.build(ds, mesh, cfg)
    params = SearchParams(k=5, query_cut=10, block_budget=0)
    s_sh, i_sh = sharded.search_batch(q_comps, q_vals, params,
                                      heap_factor=0.0)

    arrays = build_index(ds, cfg)
    s_1, i_1 = search_batch(arrays.to_device(), q_comps, q_vals, params,
                            heap_factor=0.0)
    # same documents found (block structure differs per shard, but with
    # full budgets the candidate sets cover the same lists)
    for a, b in zip(i_sh, i_1):
        assert set(map(int, a[a >= 0])) == set(map(int, b[b >= 0]))
    assert np.allclose(s_sh, s_1, atol=1e-3)


def test_sharded_tiles_mode(setup):
    """Tiles doc-scoring under shard_map matches the exact oracle."""
    ds, cfg, q_comps, q_vals = setup
    mesh = make_mesh(n_docs_shards=4, n_data=1)
    sharded = ShardedIndex.build(ds, mesh, cfg)
    params = SearchParams(k=10, query_cut=10, doc_mode="tiles",
                          full_lists=True)
    scores, ids = sharded.search_batch(q_comps, q_vals, params)
    _, gt_i = exact_search_numpy(ds, q_comps, q_vals, k=10)
    hits = sum(
        len(set(map(int, r[r >= 0])) & set(map(int, g[g >= 0])))
        for r, g in zip(ids, gt_i)
    )
    tot = sum(len(set(map(int, g[g >= 0]))) for g in gt_i)
    assert hits / tot >= 0.9


def test_sharded_save_load_roundtrip(setup, tmp_path):
    """ShardedIndex.save/load preserves search results (lifecycle parity
    with the reference's index persistence)."""
    ds, cfg, q_comps, q_vals = setup
    mesh = make_mesh(n_docs_shards=2, n_data=1)
    sharded = ShardedIndex.build(ds, mesh, cfg)
    params = SearchParams(k=10, query_cut=10, block_budget=0)
    s0, i0 = sharded.search_batch(q_comps, q_vals, params, heap_factor=0.0)

    path = str(tmp_path / "sharded_idx")
    sharded.save(path)
    loaded = ShardedIndex.load(path, mesh)
    assert loaded.total_docs == sharded.total_docs
    assert loaded.n_shards == 2
    s1, i1 = loaded.search_batch(q_comps, q_vals, params, heap_factor=0.0)
    assert np.array_equal(i0, i1)
    assert np.allclose(s0, s1)


def test_sharded_load_wrong_mesh_raises(setup, tmp_path):
    ds, cfg, q_comps, q_vals = setup
    mesh2 = make_mesh(n_docs_shards=2, n_data=1)
    sharded = ShardedIndex.build(ds, mesh2, cfg)
    path = str(tmp_path / "sharded_idx2")
    sharded.save(path)
    mesh4 = make_mesh(n_docs_shards=4, n_data=1)
    with pytest.raises(ValueError, match="shards"):
        ShardedIndex.load(path, mesh4)


def test_parallel_shard_build_matches_sequential(setup):
    """Thread-pool shard builds produce the same index as sequential."""
    ds, cfg, q_comps, q_vals = setup
    mesh = make_mesh(n_docs_shards=2, n_data=1)
    a = ShardedIndex.build(ds, mesh, cfg, n_workers=1)
    b = ShardedIndex.build(ds, mesh, cfg, n_workers=2)
    params = SearchParams(k=10, query_cut=10, block_budget=0)
    sa, ia = a.search_batch(q_comps, q_vals, params, heap_factor=0.0)
    sb, ib = b.search_batch(q_comps, q_vals, params, heap_factor=0.0)
    assert np.array_equal(ia, ib)
    assert np.allclose(sa, sb)


@pytest.mark.slow
def test_sharded_grouped_matches_single():
    """Doc-sharded grouped fast path (per-shard host plans + grouped
    kernel + exact rescore inside shard_map, all-gather merge) must agree
    with the single-index grouped path over the concatenated collection."""
    import numpy as np

    from seismic_tpu import Configuration, TpuLayout
    from seismic_tpu.build.builder import build_index
    from seismic_tpu.parallel.mesh import make_mesh
    from seismic_tpu.parallel.sharded import ShardedIndex
    from seismic_tpu.search.engine import pad_queries
    from seismic_tpu.search.grouped import GroupedParams, search_grouped
    from seismic_tpu.search.planner import PlannerContext
    from tests.conftest import make_random_dataset, make_random_queries

    rng = np.random.default_rng(3)
    ds = make_random_dataset(rng, n_docs=240, dim=400, min_nnz=10,
                             max_nnz=30, seed=21)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256,
                                         tile_overflow=8))
    qc, qv = make_random_queries(np.random.default_rng(4), n_queries=8,
                                 dim=400, min_nnz=6, max_nnz=20)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    gp = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                       compute_dtype="f32", pool_mode="exact")

    arrays = build_index(ds, cfg)
    dev = arrays.to_device(pallas_tiles=True)
    ctx = PlannerContext.from_arrays(arrays)
    s_ref, i_ref = search_grouped(dev, ctx, q_comps, q_vals, gp,
                                  query_cut=8)

    mesh = make_mesh(n_docs_shards=4, n_data=1)
    sharded = ShardedIndex.build(ds, mesh, cfg, pallas_tiles=True)
    s_sh, i_sh = sharded.search_batch_grouped(q_comps, q_vals, gp,
                                              query_cut=8)

    for b in range(len(i_ref)):
        ref = {int(d): float(s) for s, d in zip(s_ref[b], i_ref[b])
               if d >= 0}
        got = {int(d): float(s) for s, d in zip(s_sh[b], i_sh[b])
               if d >= 0}
        shared = set(ref) & set(got)
        # sharded search unions per-shard top-k pools, so sets can differ
        # at the tail; the top half must agree with identical exact scores
        assert len(shared) >= 5
        for d in shared:
            assert abs(ref[d] - got[d]) < 1e-4 * max(1.0, abs(ref[d]))


@pytest.mark.slow
def test_sharded_grouped_data_parallel_and_knn():
    """Round-3 widened fast path: a (data 2 x docs 4) mesh shards the
    query batch too — results must match the pure-doc-sharded run; and
    ShardedIndex.build_knn + n_knn refinement must not lose recall."""
    import numpy as np

    from seismic_tpu import Configuration, TpuLayout
    from seismic_tpu.parallel.mesh import make_mesh
    from seismic_tpu.parallel.sharded import ShardedIndex
    from seismic_tpu.search.engine import pad_queries
    from seismic_tpu.search.grouped import GroupedParams
    from seismic_tpu.search.exact import exact_search_numpy
    from tests.conftest import make_random_dataset, make_random_queries

    rng = np.random.default_rng(5)
    ds = make_random_dataset(rng, n_docs=240, dim=400, min_nnz=10,
                             max_nnz=30, seed=31)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256,
                                         tile_overflow=8))
    qc, qv = make_random_queries(np.random.default_rng(6), n_queries=8,
                                 dim=400, min_nnz=6, max_nnz=20)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    gp = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                       compute_dtype="f32", pool_mode="exact")

    mesh1 = make_mesh(n_docs_shards=4, n_data=1)
    sharded1 = ShardedIndex.build(ds, mesh1, cfg, pallas_tiles=True)
    s1, i1 = sharded1.search_batch_grouped(q_comps, q_vals, gp,
                                           query_cut=8)

    mesh2 = make_mesh(n_docs_shards=4, n_data=2)
    sharded2 = ShardedIndex.build(ds, mesh2, cfg, pallas_tiles=True)
    s2, i2 = sharded2.search_batch_grouped(q_comps, q_vals, gp,
                                           query_cut=8)
    assert np.array_equal(i1, i2)
    assert np.allclose(s1, s2, rtol=1e-5)

    # batch must divide the data axis
    with pytest.raises(ValueError):
        sharded2.search_batch_grouped(q_comps[:7], q_vals[:7], gp,
                                      query_cut=8)

    # per-shard kNN graphs + refined search
    sharded2.build_knn(nknn=4, batch_size=64)
    assert all(s.knn is not None for s in sharded2.host_shards)
    gpr = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                        compute_dtype="f32", pool_mode="exact", n_knn=4)
    s3, i3 = sharded2.search_batch_grouped(q_comps, q_vals, gpr,
                                           query_cut=8)
    _, gt_i = exact_search_numpy(ds, q_comps, q_vals, k=10)

    def recall(ids):
        hits = sum(
            len(set(map(int, r[r >= 0])) & set(map(int, g[g >= 0])))
            for r, g in zip(ids, gt_i)
        )
        tot = sum(len(set(map(int, g[g >= 0]))) for g in gt_i)
        return hits / tot

    assert recall(i3) >= recall(i2) - 1e-9
