"""Grouped (list-major, tile-reusing) search path: planner invariants and
end-to-end parity with the round-1 tiles path / exact oracle.

The Pallas kernel runs in Mosaic interpret mode on CPU here; on-TPU
bit-equality is asserted by the bench preamble (bench.py)."""

import dataclasses

import numpy as np
import pytest

from seismic_tpu import Configuration, SearchParams, TpuLayout
from seismic_tpu.build.builder import build_index
from seismic_tpu.ops.pallas_grouped import SUB
from seismic_tpu.search.engine import pad_queries, search_batch
from seismic_tpu.search.exact import exact_search_numpy
from seismic_tpu.search.grouped import (
    GroupedParams,
    search_grouped,
)
from seismic_tpu.search.planner import PlannerContext, plan_grouped
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
    return ds, arrays, ctx, q_comps, q_vals, gt_i


def _recall(ids, gt_ids, k=10):
    hits = tot = 0
    for row, gt in zip(ids, gt_ids):
        r = {int(d) for d in row[:k] if d >= 0}
        g = {int(d) for d in gt[:k] if d >= 0}
        hits += len(r & g)
        tot += len(g)
    return hits / max(tot, 1)


def test_planner_invariants(setup):
    _, arrays, ctx, q_comps, q_vals, _ = setup
    QC, M = 10, 8
    plan = plan_grouped(q_comps, q_vals, ctx, QC, M=M)
    B = q_comps.shape[0]

    # every valid pair maps to a unique slot of a real group
    slots = plan.pair_slot[plan.pair_valid]
    assert len(set(slots.tolist())) == len(slots)
    assert (slots < plan.G * M).all()

    # slot_b inverse-maps back to the pair's query
    g, m = slots // M, slots % M
    bb, qq = np.nonzero(plan.pair_valid)
    assert (plan.slot_b[g, m] == bb).all()
    # slot_pair is the exact inverse of pair_slot on valid pairs
    assert (plan.slot_pair[slots] == bb * QC + qq).all()
    # pair_list matches the planner's selection metadata
    ll = plan.pair_list[plan.pair_valid]
    assert (plan.group_list[g] == ll).all()

    # groups are homogeneous: all slots of a group share one list, and the
    # group's metadata matches that list
    for gi in range(plan.G):
        l = plan.group_list[gi]
        assert plan.group_region[gi] == ctx.list_region_start[l]
        assert plan.group_nrows[gi] == ctx.list_len[l]
    # padding groups are inert
    assert (plan.group_nrows[plan.G:] == 0).all()
    assert (plan.slot_b[plan.G:] == B).all()

    # work items cover each real group's subtiles exactly once
    nsub = np.maximum(1, -(-plan.group_nrows[: plan.G] // SUB))
    assert plan.W == nsub.sum()
    wg = plan.work_g[: plan.W]
    ws = plan.work_s[: plan.W]
    for gi in range(plan.G):
        s = np.sort(ws[wg == gi])
        assert (s == np.arange(nsub[gi])).all()
    assert (
        plan.work_region[: plan.W]
        == plan.group_region[wg] + ws
    ).all()
    # padded work items dump into the (inert) group G at the zero region
    assert (plan.work_g[plan.W:] == plan.G).all()
    assert (plan.work_region[plan.W:] == ctx.zero_region).all()


@pytest.mark.slow
def test_grouped_matches_tiles_path(setup):
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)

    t_params = SearchParams(k=10, query_cut=10, doc_mode="tiles",
                            full_lists=True, score_cut=64, dedup_pool=128)
    s_ref, i_ref = search_batch(dev, q_comps, q_vals, t_params)

    # exact-operand config: f32 matmul + whole-pool overflow re-rank
    # reproduces the round-1 tiles scores bit-for-bit up to reduction order
    g_exact = GroupedParams(k=10, score_cut=64, pool=128,
                            compute_dtype="f32", ovf_pool=0)
    s_new, i_new = search_grouped(dev, ctx, q_comps, q_vals, g_exact,
                                  query_cut=10, M=8)
    r_ref, r_new = _recall(i_ref, gt_i), _recall(i_new, gt_i)
    assert r_new >= r_ref - 0.02
    agree = np.mean(
        [s_new[b, 0] == pytest.approx(s_ref[b, 0], rel=1e-4)
         for b in range(len(s_new))]
    )
    assert agree >= 0.99

    # fast default (bf16 matmul, pallas qloc, dedup-first ovf): scores
    # within bf16 rounding, recall preserved
    g_fast = GroupedParams(k=10, score_cut=64, pool=128)
    s_f, i_f = search_grouped(dev, ctx, q_comps, q_vals, g_fast,
                              query_cut=10, M=8)
    assert _recall(i_f, gt_i) >= r_ref - 0.02
    rel = np.abs(s_f[:, 0] - s_ref[:, 0]) / np.maximum(
        np.abs(s_ref[:, 0]), 1e-6
    )
    assert float(rel.max()) < 5e-3


@pytest.mark.slow
def test_grouped_no_duplicates_and_sorted(setup):
    _, arrays, ctx, q_comps, q_vals, _ = setup
    dev = arrays.to_device(pallas_tiles=True)
    params = GroupedParams(k=10)
    scores, ids = search_grouped(dev, ctx, q_comps, q_vals, params,
                                 query_cut=10)
    for srow, row in zip(scores, ids):
        real = [int(d) for d in row if d >= 0]
        assert len(real) == len(set(real))
        fin = srow[np.isfinite(srow)]
        assert (np.diff(fin) <= 1e-6).all()


@pytest.mark.slow
def test_grouped_various_m_and_qc(setup):
    _, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)
    base = None
    for M in (8, 16):
        for qc in (5, 12):
            params = GroupedParams(k=10)
            _, ids = search_grouped(dev, ctx, q_comps, q_vals, params,
                                    query_cut=qc, M=M)
            r = _recall(ids, gt_i)
            if base is None:
                base = r
            assert r > 0.5


@pytest.mark.slow
def test_grouped_rescore_exact_scores(setup):
    """rescore>0 must return EXACT dot products for the returned docs
    (removes tile quantization + vocab truncation error entirely)."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)
    params = GroupedParams(k=10, score_cut=64, pool=128, rescore=48)
    scores, ids = search_grouped(dev, ctx, q_comps, q_vals, params,
                                 query_cut=10)
    s_gt, i_gt = exact_search_numpy(ds, q_comps, q_vals, k=50)
    exact_of = [
        {int(i): float(s) for s, i in zip(srow, irow)}
        for srow, irow in zip(s_gt, i_gt)
    ]
    checked = 0
    for b in range(len(ids)):
        for s, d in zip(scores[b], ids[b]):
            if d >= 0 and int(d) in exact_of[b]:
                assert abs(float(s) - exact_of[b][int(d)]) < 1e-3, (
                    b, d, s, exact_of[b][int(d)])
                checked += 1
    assert checked > 50


@pytest.mark.slow
def test_grouped_rescore_knn_refine(setup):
    """n_knn>0 with rescore uses the compare-kernel refinement and must
    not lose recall vs no refinement."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    from seismic_tpu.search import knn as knn_mod

    dev0 = arrays.to_device(pallas_tiles=True)
    arrays.knn = knn_mod.build_knn(arrays, dev0, nknn=6, batch_size=64)
    dev = arrays.to_device(pallas_tiles=True)
    base = GroupedParams(k=10, score_cut=64, pool=128, rescore=48)
    ref = GroupedParams(k=10, score_cut=64, pool=128, rescore=48, n_knn=6)
    ref2 = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                         n_knn=6, knn_rounds=2)
    _, i0 = search_grouped(dev, ctx, q_comps, q_vals, base, query_cut=6)
    _, i1 = search_grouped(dev, ctx, q_comps, q_vals, ref, query_cut=6)
    _, i2 = search_grouped(dev, ctx, q_comps, q_vals, ref2, query_cut=6)
    r0, r1, r2 = _recall(i0, gt_i), _recall(i1, gt_i), _recall(i2, gt_i)
    assert r1 >= r0 - 1e-9
    # a second refinement round (depth-2 graph walk) never loses recall
    assert r2 >= r1 - 1e-9
    # knn_top: refining only the top-m entries' neighbors still never
    # loses recall vs no refinement, and knn_top=k equals the full round
    reft = dataclasses.replace(ref, knn_top=4)
    _, it = search_grouped(dev, ctx, q_comps, q_vals, reft, query_cut=6)
    assert _recall(it, gt_i) >= r0 - 1e-9
    refk = dataclasses.replace(ref, knn_top=10)
    _, ik = search_grouped(dev, ctx, q_comps, q_vals, refk, query_cut=6)
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(i1))
    arrays.knn = None


@pytest.mark.slow
def test_grouped_i8_mode(setup):
    """int8 MXU mode: per-pair symmetric qloc quantization applied in the
    regroup stage must track the bf16 path closely (the i8 rounding error
    is below the u8 tile quantization already present)."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)
    base = GroupedParams(k=10, score_cut=64, pool=128,
                         compute_dtype="bf16", pool_mode="exact")
    i8 = GroupedParams(k=10, score_cut=64, pool=128,
                       compute_dtype="i8", pool_mode="exact")
    s_b, i_b = search_grouped(dev, ctx, q_comps, q_vals, base, query_cut=10)
    s_8, i_8 = search_grouped(dev, ctx, q_comps, q_vals, i8, query_cut=10)
    r_b = _recall(i_b, gt_i)
    r_8 = _recall(i_8, gt_i)
    assert r_8 >= r_b - 0.02
    # scores of agreeing ids must match to i8-quantization tolerance
    for b in range(len(i_b)):
        mb = {int(d): float(s) for s, d in zip(s_b[b], i_b[b]) if d >= 0}
        for s, d in zip(s_8[b], i_8[b]):
            if d >= 0 and int(d) in mb:
                assert abs(float(s) - mb[int(d)]) <= 0.05 * max(
                    1.0, abs(mb[int(d)])
                )


@pytest.mark.slow
def test_grouped_i8_rescore(setup):
    """i8 ranking + exact rescore returns exact scores."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)
    params = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                           compute_dtype="i8")
    scores, ids = search_grouped(dev, ctx, q_comps, q_vals, params,
                                 query_cut=10)
    s_gt, i_gt = exact_search_numpy(ds, q_comps, q_vals, k=50)
    exact_of = [
        {int(i): float(s) for s, i in zip(srow, irow)}
        for srow, irow in zip(s_gt, i_gt)
    ]
    checked = 0
    for b in range(len(ids)):
        for s, d in zip(scores[b], ids[b]):
            if d >= 0 and int(d) in exact_of[b]:
                assert abs(float(s) - exact_of[b][int(d)]) < 1e-3
                checked += 1
    assert checked > len(ids) * 5
    assert _recall(ids, gt_i) > 0.5


@pytest.mark.slow
def test_grouped_rescore_dedup_post(setup):
    """dedup_mode=post must return unique ids with exact scores."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)
    params = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                           compute_dtype="i8", dedup_mode="post")
    scores, ids = search_grouped(dev, ctx, q_comps, q_vals, params,
                                 query_cut=10)
    s_gt, i_gt = exact_search_numpy(ds, q_comps, q_vals, k=50)
    exact_of = [
        {int(i): float(s) for s, i in zip(srow, irow)}
        for srow, irow in zip(s_gt, i_gt)
    ]
    for b in range(len(ids)):
        real = [int(d) for d in ids[b] if d >= 0]
        assert len(real) == len(set(real))  # unique
        for s, d in zip(scores[b], ids[b]):
            if d >= 0 and int(d) in exact_of[b]:
                assert abs(float(s) - exact_of[b][int(d)]) < 1e-3
    assert _recall(ids, gt_i) > 0.5


def test_grouped_fwd_f16_fused_and_chunked_rescore(setup):
    """to_device(fwd_f16=True) packs (comp i16 | f16 value) into one i32
    word per forward slot — half the fused tile's HBM (the 1M-bar lever,
    round 5). Scores must match the exact oracle within f16 value
    rounding, and rescore_chunk (sequential column chunks bounding the
    gather temps) must not change results at all."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev16 = arrays.to_device(pallas_tiles=True, fwd_f16=True)
    assert dev16.fwd_fused16 is not None
    assert dev16.fwd_fused is None
    assert dev16.fwd_comps is None and dev16.fwd_vals is None
    W = np.asarray(arrays.fwd_comps).shape[1]
    assert dev16.fwd_fused16.shape == (len(ds), W)

    params = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                           compute_dtype="i8")
    s1, i1 = search_grouped(dev16, ctx, q_comps, q_vals, params,
                            query_cut=10)
    s_gt, i_gt = exact_search_numpy(ds, q_comps, q_vals, k=50)
    exact_of = [
        {int(i): float(s) for s, i in zip(srow, irow)}
        for srow, irow in zip(s_gt, i_gt)
    ]
    checked = 0
    for b in range(len(i1)):
        for s, d in zip(s1[b], i1[b]):
            if d >= 0 and int(d) in exact_of[b]:
                ref = exact_of[b][int(d)]
                assert abs(float(s) - ref) < 5e-3 + 2e-3 * abs(ref)
                checked += 1
    assert checked > len(i1) * 5
    assert _recall(i1, gt_i) > 0.5

    # chunking only re-batches the gather: results are identical
    pc = dataclasses.replace(params, rescore_chunk=16)
    s2, i2 = search_grouped(dev16, ctx, q_comps, q_vals, pc,
                            query_cut=10)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    f = np.isfinite(np.asarray(s1))
    assert np.allclose(np.asarray(s1)[f], np.asarray(s2)[f],
                       rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_grouped_csub2_matches_csub1(setup):
    """csub=2 super-tile layout must reproduce csub=1 results exactly
    (same scores, same ids) — only the DMA granularity changes."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    from seismic_tpu.search.planner import PlannerContext

    dev1 = arrays.to_device(pallas_tiles=True)
    dev2 = arrays.to_device(pallas_tiles=True, tile_csub=2)
    ctx2 = PlannerContext.from_arrays(arrays, csub=2)
    params = GroupedParams(k=10, score_cut=64, pool=128,
                           compute_dtype="f32", ovf_pool=0,
                           pool_mode="exact")
    s1, i1 = search_grouped(dev1, ctx, q_comps, q_vals, params,
                            query_cut=10)
    s2, i2 = search_grouped(dev2, ctx2, q_comps, q_vals, params,
                            query_cut=10)
    assert np.allclose(s1, s2, rtol=1e-5, atol=1e-5)
    for b in range(len(i1)):
        assert set(i1[b][s1[b] > -np.inf].tolist()) == set(
            i2[b][s2[b] > -np.inf].tolist()
        )


@pytest.mark.slow
def test_device_derived_plan_matches_host(setup):
    """The on-device plan derivation must reproduce the host-planned
    search results exactly (same plan semantics, no plan upload)."""
    import jax.numpy as jnp

    from seismic_tpu.search.grouped import (
        DevicePlan,
        plan_caps,
        search_grouped_derive_jit,
        search_grouped_jit,
    )
    from seismic_tpu.search.planner import plan_grouped

    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)
    gp = GroupedParams(k=10, score_cut=64, pool=128, compute_dtype="f32",
                       ovf_pool=0, pool_mode="exact")
    qd = jnp.asarray(q_comps, jnp.int32)
    vd = jnp.asarray(q_vals, jnp.float32)

    plan = plan_grouped(q_comps, q_vals, ctx, 10, M=8)
    s_h, i_h = search_grouped_jit(dev, DevicePlan.put(plan), qd, vd, gp)
    G_cap, W_cap = plan_caps(q_comps, q_vals, ctx, 10, M=8)
    assert (G_cap, W_cap) == (plan.G_cap, plan.W_cap)
    s_d, i_d = search_grouped_derive_jit(
        dev, qd, vd, gp, 10, 8, G_cap, W_cap, ctx.zero_region
    )
    s_h, i_h, s_d, i_d = map(np.asarray, (s_h, i_h, s_d, i_d))
    assert np.allclose(s_h, s_d, rtol=1e-5, atol=1e-6)
    for b in range(len(i_h)):
        assert set(i_h[b].tolist()) == set(i_d[b].tolist())


@pytest.mark.slow
def test_stream_budget_mode(setup):
    """Summary-guided streaming budget: stream_frac < 1 must keep recall
    close to the exhaustive scan (the upper-bound priorities keep the
    super-tiles that matter) and never return scores for docs of skipped
    tiles."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True, super_summaries=True)
    base = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                         compute_dtype="i8")
    s_f, i_f = search_grouped(dev, ctx, q_comps, q_vals, base,
                              query_cut=10)
    r_full = _recall(i_f, gt_i)
    for frac in (0.75, 0.5):
        gp = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                           compute_dtype="i8", stream_frac=frac)
        s_b, i_b = search_grouped(dev, ctx, q_comps, q_vals, gp,
                                  query_cut=10)
        r = _recall(i_b, gt_i)
        assert r >= r_full - (0.12 if frac == 0.5 else 0.06)


@pytest.mark.slow
def test_kernel_unroll_item_major(setup):
    """kernel_unroll > 1 (U work items per grid step, work-item-major
    output + prefix-sum regroup) computes the same scores as the unrolled
    grid — results must match the U=1 path exactly for deterministic pool
    modes."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    from seismic_tpu.search.planner import PlannerContext

    for csub in (1, 2):
        dev = arrays.to_device(pallas_tiles=True, tile_csub=csub)
        ctxc = PlannerContext.from_arrays(arrays, csub=csub)
        for pm in ("exact", "stride", "hier"):
            base = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                                 compute_dtype="i8", pool_mode=pm)
            un = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                               compute_dtype="i8", pool_mode=pm,
                               kernel_unroll=2)
            s_b, i_b = search_grouped(dev, ctxc, q_comps, q_vals, base,
                                      query_cut=10)
            s_u, i_u = search_grouped(dev, ctxc, q_comps, q_vals, un,
                                      query_cut=10)
            np.testing.assert_array_equal(i_u, i_b, err_msg=f"{pm}/{csub}")
            np.testing.assert_allclose(s_u, s_b, rtol=1e-6,
                                       err_msg=f"{pm}/{csub}")


@pytest.mark.slow  # opt-in mode, not on any production path (r3 findings)
def test_vocab_residue_qloc(setup):
    """Residue-ordered vocab + bucketed qloc kernel: same results as the
    plain projection when no bucket overflows (scb >= sc covers every
    term), and recall within tolerance at the production scb."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    base = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                         compute_dtype="i8", pool_mode="exact")
    dev = arrays.to_device(pallas_tiles=True)
    s_b, i_b = search_grouped(dev, ctx, q_comps, q_vals, base,
                              query_cut=10)

    dev_r = arrays.to_device(pallas_tiles=True, vocab_residue=8)
    assert dev_r.vocab_residue == 8
    # scb=64 cannot overflow (64 terms total): only the per-list residue
    # slot cap (V/R per group) may drop terms; tiny lists fit entirely
    wide = dataclasses.replace(base, residue_scb=64)
    s_r, i_r = search_grouped(dev_r, ctx, q_comps, q_vals, wide,
                              query_cut=10)
    assert _recall(i_r, gt_i) >= _recall(i_b, gt_i) - 0.02
    # production bucket capacity
    prod = dataclasses.replace(base, residue_scb=16)
    _, i_p = search_grouped(dev_r, ctx, q_comps, q_vals, prod,
                            query_cut=10)
    assert _recall(i_p, gt_i) >= _recall(i_b, gt_i) - 0.03
    # combined with the unrolled item-major kernel
    both = dataclasses.replace(base, residue_scb=16, kernel_unroll=2)
    _, i_u = search_grouped(dev_r, ctx, q_comps, q_vals, both,
                            query_cut=10)
    np.testing.assert_array_equal(i_u, i_p)


def test_pool_mode_hier(setup):
    """Hierarchical pool (per-pair top-t + exact merge) must track the
    exact pool's recall closely."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)
    base = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                         compute_dtype="i8", pool_mode="exact")
    hier = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                         compute_dtype="i8", pool_mode="hier")
    s_e, i_e = search_grouped(dev, ctx, q_comps, q_vals, base,
                              query_cut=10)
    s_h, i_h = search_grouped(dev, ctx, q_comps, q_vals, hier,
                              query_cut=10)
    assert _recall(i_h, gt_i) >= _recall(i_e, gt_i) - 0.03


def test_pool_mode_seg(setup):
    """Exact two-level segment pool: the top-`pool` segments by max
    provably contain the exact top-`pool` rows, so results must EQUAL
    pool_mode="exact" (same ids and scores, not just recall), for every
    segment width and with the unrolled item-major kernel."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)
    base = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                         compute_dtype="i8", pool_mode="exact")
    s_e, i_e = search_grouped(dev, ctx, q_comps, q_vals, base,
                              query_cut=10)
    for segw in (16, 32, 128):
        seg = dataclasses.replace(base, pool_mode="seg",
                                  pool_seg_width=segw)
        s_s, i_s = search_grouped(dev, ctx, q_comps, q_vals, seg,
                                  query_cut=10)
        np.testing.assert_array_equal(i_s, i_e, err_msg=f"segw={segw}")
        np.testing.assert_allclose(s_s, s_e, rtol=1e-6,
                                   err_msg=f"segw={segw}")
    # unrolled kernel + bf16 wall (the headline combination)
    segu = dataclasses.replace(base, pool_mode="seg", pool_seg_width=32,
                               kernel_unroll=2, pool_dtype="bf16")
    _, i_u = search_grouped(dev, ctx, q_comps, q_vals, segu,
                            query_cut=10)
    assert _recall(i_u, gt_i) >= _recall(i_e, gt_i) - 0.03


def test_pool_dtype_bf16(setup):
    """pool_dtype="bf16" halves the regrouped score-wall traffic; only
    pool ORDER can change (near-ties at the boundary), the rescore stays
    exact — recall must track the f32 pool closely on every pool mode."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)
    for pm in ("exact", "hier"):
        f32 = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                            compute_dtype="i8", pool_mode=pm)
        b16 = dataclasses.replace(f32, pool_dtype="bf16")
        _, i_f = search_grouped(dev, ctx, q_comps, q_vals, f32,
                                query_cut=10)
        s_b, i_b = search_grouped(dev, ctx, q_comps, q_vals, b16,
                                  query_cut=10)
        assert s_b.dtype == np.float32 or s_b.dtype.name == "float32"
        assert _recall(i_b, gt_i) >= _recall(i_f, gt_i) - 0.03, pm


@pytest.mark.slow
def test_pool_mode_slot_and_window(setup):
    """Round-3 tail-cut pools: "slot" (pool on the kernel slot grid before
    the regroup) must track the exact pool; "window" (packed score|index
    reduce_window) caps each pair to LLMAX/pool_window candidates, so on
    this tiny index (short lists) only exactness of the returned scores is
    asserted — its recall story is bench-shape territory."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)
    base = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                         pool_mode="exact")
    s_b, i_b = search_grouped(dev, ctx, q_comps, q_vals, base, query_cut=10)
    r_b = _recall(i_b, gt_i)

    for dt in ("bf16", "i8"):
        slot = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                             pool_mode="slot", compute_dtype=dt)
        _, i_s = search_grouped(dev, ctx, q_comps, q_vals, slot,
                                query_cut=10)
        assert _recall(i_s, gt_i) >= r_b - 0.02, dt

    # stride pool (conflates only rows >= 32 apart, i.e. different
    # k-means blocks) must track the exact pool's recall
    for ps in (8, 4):
        st = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                           pool_mode="stride", pool_stride=ps,
                           compute_dtype="i8")
        _, i_t = search_grouped(dev, ctx, q_comps, q_vals, st,
                                query_cut=10)
        assert _recall(i_t, gt_i) >= r_b - 0.02, ps

    # csub=2 exercises the IN-KERNEL half of the stride max (pack_window
    # rk=2: 128-aligned lane slices) plus the XLA remainder, and the
    # approx final pool selection
    from seismic_tpu.search.planner import PlannerContext

    dev2 = arrays.to_device(pallas_tiles=True, tile_csub=2)
    ctx2 = PlannerContext.from_arrays(arrays, csub=2)
    st2 = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                        pool_mode="stride", pool_stride=8,
                        pool_select="approx", compute_dtype="i8")
    _, i_t2 = search_grouped(dev2, ctx2, q_comps, q_vals, st2,
                             query_cut=10)
    assert _recall(i_t2, gt_i) >= r_b - 0.02

    # qloc_cut: a cheaper approximate projection (top-32 terms) with the
    # exact rescore still at score_cut terms must track the exact pool
    # (16 was measured too aggressive on this synthetic: recall -0.10)
    qc32 = GroupedParams(k=10, score_cut=64, qloc_cut=32, pool=128,
                         rescore=48, compute_dtype="i8")
    _, i_q = search_grouped(dev, ctx, q_comps, q_vals, qc32, query_cut=10)
    assert _recall(i_q, gt_i) >= r_b - 0.05

    s_gt, i_gt = exact_search_numpy(ds, q_comps, q_vals, k=50)
    exact_of = [
        {int(i): float(s) for s, i in zip(srow, irow)}
        for srow, irow in zip(s_gt, i_gt)
    ]
    win = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                        pool_mode="window")
    s_w, i_w = search_grouped(dev, ctx, q_comps, q_vals, win, query_cut=10)
    checked = 0
    for b in range(len(i_w)):
        for s, d in zip(s_w[b], i_w[b]):
            if d >= 0 and int(d) in exact_of[b]:
                assert abs(float(s) - exact_of[b][int(d)]) < 1e-3
                checked += 1
    assert checked > 50
    # docs the window pool does return are no worse than random: the
    # packed-index max is the window's true best row
    assert _recall(i_w, gt_i) >= 0.5


@pytest.mark.slow
def test_weighted_cut(setup):
    """Weighted list selection (value * per-list max posting value) must
    run through derive with host caps matching, and keep recall at or
    above the plain cut at equal query_cut."""
    import jax.numpy as jnp

    from seismic_tpu.search.grouped import (
        plan_caps,
        search_grouped_derive_jit,
    )

    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)
    assert ctx.list_weight is not None and dev.list_weight is not None
    gp = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                       compute_dtype="i8")
    qd = jnp.asarray(q_comps, jnp.int32)
    vd = jnp.asarray(q_vals, jnp.float32)
    rs = {}
    for weighted in (False, True):
        gc, wc = plan_caps(q_comps, q_vals, ctx, 8, M=8,
                           weighted=weighted)
        s, i = search_grouped_derive_jit(
            dev, qd, vd, gp, 8, 8, gc, wc, ctx.zero_region,
            weighted=weighted,
        )
        rs[weighted] = _recall(np.asarray(i), gt_i)
    assert rs[True] >= rs[False] - 0.02, rs


@pytest.mark.slow  # opt-in mode, TPU-measured -2% (r5b): not production
def test_qloc_rowmajor_matches_lane_major(setup):
    """The row-major i8 qloc kernel (project_qloc_rowmajor) must return
    the same results as the lane-major path: same compare-accumulate
    order, same per-pair symmetric quantization — only the layouts (and
    the three materialized transposes) differ."""
    ds, arrays, ctx, q_comps, q_vals, gt_i = setup
    dev = arrays.to_device(pallas_tiles=True)
    lane = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                         compute_dtype="i8", pool_mode="exact")
    row = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                        compute_dtype="i8", pool_mode="exact",
                        qloc_mode="rowmajor")
    s_l, i_l = search_grouped(dev, ctx, q_comps, q_vals, lane,
                              query_cut=10)
    s_r, i_r = search_grouped(dev, ctx, q_comps, q_vals, row,
                              query_cut=10)
    np.testing.assert_array_equal(i_r, i_l)
    np.testing.assert_allclose(s_r, s_l, rtol=1e-5, atol=1e-6)

    # hier pool + unrolled kernel combination (the bench operating point)
    laneh = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                          compute_dtype="i8", pool_mode="hier",
                          pool_per_pair=16, kernel_unroll=2)
    rowh = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                         compute_dtype="i8", pool_mode="hier",
                         pool_per_pair=16, kernel_unroll=2,
                         qloc_mode="rowmajor")
    _, i_lh = search_grouped(dev, ctx, q_comps, q_vals, laneh,
                             query_cut=10)
    _, i_rh = search_grouped(dev, ctx, q_comps, q_vals, rowh,
                             query_cut=10)
    np.testing.assert_array_equal(i_rh, i_lh)
