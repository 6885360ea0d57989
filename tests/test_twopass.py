"""Two-pass adaptive pooled search (search/twopass.py): the TPU recast of
the reference's per-query heap adaptivity (src/posting_list.rs:130,169 —
work stops when a block's bound cannot beat the current kth score).

Pass 1 runs a cheap fixed pool and returns a per-query pool-truncation
margin; flagged queries are compacted and re-run deep. These tests pin
the margin semantics and the replace-rows contract on CPU."""

import dataclasses

import numpy as np
import pytest

from seismic_tpu import Configuration, TpuLayout
from seismic_tpu.build.builder import build_index
from seismic_tpu.search.engine import pad_queries
from seismic_tpu.search.exact import exact_search_numpy
from seismic_tpu.search.grouped import GroupedParams
from seismic_tpu.search.planner import PlannerContext
from seismic_tpu.search.twopass import TwoPassParams, search_batch_twopass
from tests.conftest import make_random_dataset, make_random_queries


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    ds = make_random_dataset(rng, n_docs=400, dim=600, min_nnz=15,
                             max_nnz=50, seed=42)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256,
                                         tile_overflow=16))
    arrays = build_index(ds, cfg)
    qc, qv = make_random_queries(np.random.default_rng(1), n_queries=16,
                                 dim=600, min_nnz=8, max_nnz=30)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    _, gt_i = exact_search_numpy(ds, q_comps, q_vals, k=10)
    ctx = PlannerContext.from_arrays(arrays)
    index = arrays.to_device(pallas_tiles=True)
    return arrays, ctx, index, q_comps, q_vals, gt_i


def _recall(ids, gt_ids, k=10):
    hits = tot = 0
    for row, gt in zip(ids, gt_ids):
        r = {int(d) for d in row[:k] if d >= 0}
        g = {int(d) for d in gt[:k] if d >= 0}
        hits += len(r & g)
        tot += len(g)
    return hits / max(tot, 1)


def _params(cheap_pool=16, deep_pool=128):
    p1 = GroupedParams(k=10, score_cut=64, pool=cheap_pool,
                       rescore=cheap_pool, pool_mode="exact")
    p2 = GroupedParams(k=10, score_cut=64, pool=deep_pool,
                       rescore=min(64, deep_pool), pool_mode="exact")
    return p1, p2


def test_all_flagged_equals_deep_pass(setup):
    """eps = +inf flags every query: the merged output must be exactly
    the deep program's output on the full batch (the VERDICT r4 #2
    contract: two-pass == deep-pass on flagged queries)."""
    from seismic_tpu.search.grouped import plan_caps, \
        search_grouped_derive_jit
    import jax.numpy as jnp

    arrays, ctx, index, q_comps, q_vals, gt_i = setup
    p1, p2 = _params()
    tp = TwoPassParams(pass1=p1, pass2=p2, query_cut1=6, query_cut2=10,
                       eps=np.inf, eps_rel=0.0, b2_min=16, b2_frac=1.0)
    s, i, stats = search_batch_twopass(index, ctx, q_comps, q_vals, tp)
    assert stats["flagged"] == len(q_comps)

    gc, wc = plan_caps(q_comps, q_vals, ctx, 10, M=8)
    s_deep, i_deep = search_grouped_derive_jit(
        index, jnp.asarray(q_comps, jnp.int32),
        jnp.asarray(q_vals, jnp.float32), p2, 10, 8, gc, wc,
        ctx.zero_region)
    np.testing.assert_array_equal(i, np.asarray(i_deep))
    np.testing.assert_allclose(s, np.asarray(s_deep), rtol=1e-6)


def test_none_flagged_equals_pass1(setup):
    from seismic_tpu.search.grouped import plan_caps, \
        search_grouped_derive_jit
    import jax.numpy as jnp

    arrays, ctx, index, q_comps, q_vals, gt_i = setup
    p1, p2 = _params()
    tp = TwoPassParams(pass1=p1, pass2=p2, query_cut1=6, query_cut2=10,
                       eps=-np.inf, eps_rel=0.0, b2_min=16)
    s, i, stats = search_batch_twopass(index, ctx, q_comps, q_vals, tp)
    assert stats["flagged"] == 0

    gc, wc = plan_caps(q_comps, q_vals, ctx, 6, M=8)
    p1m = dataclasses.replace(p1, return_margin=True)
    s1, i1, diag = search_grouped_derive_jit(
        index, jnp.asarray(q_comps, jnp.int32),
        jnp.asarray(q_vals, jnp.float32), p1m, 6, 8, gc, wc,
        ctx.zero_region)
    np.testing.assert_array_equal(i, np.asarray(i1))


def test_flagged_rows_match_deep_rerun(setup):
    """Each flagged row of the merged output equals a standalone deep run
    over the same compacted batch (same caps, same program)."""
    from seismic_tpu.search.grouped import plan_caps, \
        search_grouped_derive_jit
    import jax.numpy as jnp

    arrays, ctx, index, q_comps, q_vals, gt_i = setup
    p1, p2 = _params()
    # a mid eps so SOME but not all queries get flagged
    tp = TwoPassParams(pass1=p1, pass2=p2, query_cut1=6, query_cut2=10,
                       eps=0.0, eps_rel=0.3, b2_min=8, b2_frac=0.5)
    s, i, stats = search_batch_twopass(index, ctx, q_comps, q_vals, tp)
    flagged = stats["flagged_idx"]
    if len(flagged) == 0:
        pytest.skip("no queries flagged at this eps on this seed")
    B2 = stats["b2"]
    sel = np.zeros(B2, np.int64)
    sel[: len(flagged)] = flagged
    q2c, q2v = q_comps[sel], q_vals[sel]
    gc2, wc2 = plan_caps(q2c, q2v, ctx, 10, M=8)
    s2, i2 = search_grouped_derive_jit(
        index, jnp.asarray(q2c, jnp.int32), jnp.asarray(q2v, jnp.float32),
        p2, 10, 8, gc2, wc2, ctx.zero_region)
    np.testing.assert_array_equal(i[flagged],
                                  np.asarray(i2)[: len(flagged)])


def test_twopass_recall_at_least_pass1(setup):
    """The adaptive pass can only replace rows with DEEPER results, so
    batch recall must not drop below the all-cheap run (and on this
    seed it strictly improves)."""
    from seismic_tpu.search.grouped import plan_caps, \
        search_grouped_derive_jit
    import jax.numpy as jnp

    arrays, ctx, index, q_comps, q_vals, gt_i = setup
    p1, p2 = _params(cheap_pool=12, deep_pool=128)  # pool must be >= k
    gc, wc = plan_caps(q_comps, q_vals, ctx, 6, M=8)
    s1, i1 = search_grouped_derive_jit(
        index, jnp.asarray(q_comps, jnp.int32),
        jnp.asarray(q_vals, jnp.float32), p1, 6, 8, gc, wc,
        ctx.zero_region)
    r1 = _recall(np.asarray(i1), gt_i)

    tp = TwoPassParams(pass1=p1, pass2=p2, query_cut1=6, query_cut2=10,
                       eps=0.0, eps_rel=0.5, b2_min=16)
    s, i, stats = search_batch_twopass(index, ctx, q_comps, q_vals, tp)
    r2 = _recall(i, gt_i)
    assert r2 >= r1
    assert 0 < stats["flagged"] <= len(q_comps)


def test_margin_semantics(setup):
    """Margins are finite for pool-filled queries, +inf when the pool
    covers every candidate (pool >= all postings of the selected lists:
    nothing can be truncated); the bias_max margin is never above the
    bias_mean one (max gap >= mean gap)."""
    from seismic_tpu.search.grouped import plan_caps, \
        search_grouped_derive_jit
    from seismic_tpu.search.twopass import margin_from_diag
    import jax.numpy as jnp

    arrays, ctx, index, q_comps, q_vals, gt_i = setup
    # pool wider than any possible candidate set for qc=2 on this index
    p_wide = GroupedParams(k=10, score_cut=64, pool=512, rescore=64,
                           pool_mode="exact", return_margin=True)
    gc, wc = plan_caps(q_comps, q_vals, ctx, 2, M=8)
    _, _, diag = search_grouped_derive_jit(
        index, jnp.asarray(q_comps, jnp.int32),
        jnp.asarray(q_vals, jnp.float32), p_wide, 2, 8, gc, wc,
        ctx.zero_region)
    margin = margin_from_diag(np.asarray(diag), "bias_mean")
    assert np.isposinf(margin).all()

    p_tight = dataclasses.replace(p_wide, pool=16, rescore=16)
    _, _, diag_t = search_grouped_derive_jit(
        index, jnp.asarray(q_comps, jnp.int32),
        jnp.asarray(q_vals, jnp.float32), p_tight, 2, 8, gc, wc,
        ctx.zero_region)
    diag_t = np.asarray(diag_t)
    m_mean = margin_from_diag(diag_t, "bias_mean")
    m_max = margin_from_diag(diag_t, "bias_max")
    # at pool=16 with 2 selected lists some queries fill the pool
    assert np.isfinite(m_mean).any()
    fin = np.isfinite(m_mean)
    assert (m_max[fin] <= m_mean[fin] + 1e-5).all()
