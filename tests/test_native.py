"""Native (C++) build core vs pure-NumPy pipeline equivalence."""

import numpy as np
import pytest

from seismic_tpu.config import (
    Configuration,
    FixedSizeBlocking,
    FixedSizeSummarization,
    TpuLayout,
)
from seismic_tpu.build.builder import build_index
from seismic_tpu.native import get_lib
from tests.conftest import make_random_dataset

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native build core unavailable (no g++)"
)


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(0)
    ds = make_random_dataset(rng, n_docs=300, dim=500, min_nnz=10,
                             max_nnz=40, seed=9)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256))
    return (
        ds,
        build_index(ds, cfg, native=False),
        build_index(ds, cfg, native=True),
    )


def test_structure_identical(pair):
    _, py, nat = pair
    assert np.array_equal(py.postings, nat.postings)
    assert np.array_equal(py.list_len, nat.list_len)
    assert np.array_equal(py.list_n_blocks, nat.list_n_blocks)
    assert np.array_equal(py.list_post_start, nat.list_post_start)
    assert np.array_equal(py.block_len, nat.block_len)
    assert np.array_equal(py.block_start, nat.block_start)
    assert np.array_equal(py.list_vocab, nat.list_vocab)
    assert np.array_equal(
        py.posting_block_local, nat.posting_block_local
    )


def test_summaries_close(pair):
    _, py, nat = pair
    assert np.array_equal(
        py.summary_comps != 2**31 - 1, nat.summary_comps != 2**31 - 1
    )
    # codes may differ by 1 on rounding-boundary values
    assert np.abs(
        py.summary_codes.astype(int) - nat.summary_codes.astype(int)
    ).max() <= 1
    assert np.allclose(py.summary_min, nat.summary_min, atol=1e-5)
    assert np.allclose(py.summary_quant, nat.summary_quant, atol=1e-6)


def test_dense_structures_close(pair):
    _, py, nat = pair
    assert np.allclose(py.dense_scale, nat.dense_scale, rtol=1e-4)
    assert np.abs(
        py.dense_summary.astype(int) - nat.dense_summary.astype(int)
    ).max() <= 1
    assert np.allclose(py.doc_tile_scale, nat.doc_tile_scale, rtol=1e-4)
    assert np.abs(
        py.doc_tiles.astype(int) - nat.doc_tiles.astype(int)
    ).max() <= 1


def test_search_results_match(pair):
    ds, py, nat = pair
    from seismic_tpu.search.engine import SearchParams, pad_queries, \
        search_batch
    from tests.conftest import make_random_queries

    qc, qv = make_random_queries(np.random.default_rng(3), n_queries=8,
                                 dim=500)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    params = SearchParams(k=10, query_cut=10, doc_mode="tiles",
                          full_lists=True)
    s1, i1 = search_batch(py.to_device(), q_comps, q_vals, params)
    s2, i2 = search_batch(nat.to_device(), q_comps, q_vals, params)
    assert (i1 == i2).mean() > 0.98
    assert np.allclose(s1, s2, atol=1e-2)


def test_fixed_strategies_native(pair):
    ds, _, _ = pair
    cfg = Configuration(
        blocking=FixedSizeBlocking(block_size=8),
        summarization=FixedSizeSummarization(n_components=32),
        layout=TpuLayout(max_block_len=16, summary_vocab_cap=256),
    )
    py = build_index(ds, cfg, native=False)
    nat = build_index(ds, cfg, native=True)
    assert np.array_equal(py.postings, nat.postings)
    assert np.array_equal(py.block_len, nat.block_len)
    assert np.array_equal(
        py.summary_comps != 2**31 - 1, nat.summary_comps != 2**31 - 1
    )


@pytest.mark.slow
def test_native_planner_matches_numpy_results():
    """The C++ planner must produce search results identical to the NumPy
    planner's (grouping composition may differ; scores/ids must not)."""
    import numpy as np
    import pytest

    from seismic_tpu import Configuration, TpuLayout
    from seismic_tpu.build.builder import build_index
    from seismic_tpu.native import get_planner_lib, plan_grouped_native
    from seismic_tpu.search.engine import pad_queries
    from seismic_tpu.search.grouped import (
        DevicePlan,
        GroupedParams,
        search_grouped_jit,
    )
    from seismic_tpu.search.planner import (
        PlannerContext,
        plan_grouped_numpy,
    )
    from tests.conftest import make_random_dataset, make_random_queries

    if get_planner_lib() is None:
        pytest.skip("native toolchain unavailable")

    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    ds = make_random_dataset(rng, n_docs=300, dim=500, min_nnz=10,
                             max_nnz=40, seed=9)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256,
                                         tile_overflow=16))
    arrays = build_index(ds, cfg)
    qc, qv = make_random_queries(np.random.default_rng(2), n_queries=8,
                                 dim=500, min_nnz=8, max_nnz=24)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    dev = arrays.to_device(pallas_tiles=True)
    ctx = PlannerContext.from_arrays(arrays)

    pn = plan_grouped_native(q_comps, q_vals, ctx, 10, M=8)
    pp = plan_grouped_numpy(q_comps, q_vals, ctx, 10, M=8)
    assert pn is not None
    assert pn.G == pp.G and pn.W == pp.W

    gp = GroupedParams(k=10, score_cut=64, pool=128, compute_dtype="f32",
                       ovf_pool=0, pool_mode="exact")
    qd = jnp.asarray(q_comps, jnp.int32)
    vd = jnp.asarray(q_vals, jnp.float32)
    s_n, i_n = search_grouped_jit(dev, DevicePlan.put(pn), qd, vd, gp)
    s_p, i_p = search_grouped_jit(dev, DevicePlan.put(pp), qd, vd, gp)
    s_n, i_n, s_p, i_p = map(np.asarray, (s_n, i_n, s_p, i_p))
    assert np.allclose(s_n, s_p, rtol=1e-5, atol=1e-6)
    for b in range(len(i_n)):
        assert set(i_n[b].tolist()) == set(i_p[b].tolist())
