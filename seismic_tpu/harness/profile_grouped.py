"""Per-stage latency attribution for the grouped (round-2) search path.

Times cumulative prefixes of `_grouped_impl` as separate jitted programs on
the real device: planner-array upload, qloc compare, slot expansion, the
grouped Pallas kernel, regroup + pool top-k, overflow re-rank, dedup.

Usage: python -m seismic_tpu.harness.profile_grouped [--batch 1024] [--qc 11]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")


def _sync(out):
    import jax

    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "shape")]
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]
    return out


def _timeit(fn, *args, reps=5):
    _sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default=os.path.join(
        ROOT, ".bench_cache", "index_100000_30522_200_v1024_o64.dir"))
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--qc", type=int, default=11)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--sc", type=int, default=64)
    ap.add_argument("--pool", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..data.sparse import PAD_COMPONENT
    from ..ops.pallas_grouped import score_grouped_pallas
    from ..ops_pallas_prep import ll_pad_for
    from ..search import engine as E
    from ..search.engine import pad_queries
    from ..search.grouped import DevicePlan, GroupedParams, search_grouped_jit
    from ..search.planner import PlannerContext, plan_grouped
    from ..types import IndexArrays
    from .synth import synth_queries

    print("devices:", jax.devices(), file=sys.stderr)
    t0 = time.time()
    arrays = IndexArrays.load(args.index)
    print(f"load: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    index = arrays.to_device(pallas_tiles=True)
    print(f"to_device: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    ctx = PlannerContext.from_arrays(arrays)
    qc_l, qv_l = synth_queries(args.batch, dim=arrays.dim, seed=11)
    q_comps_np, q_vals_np = pad_queries(qc_l, qv_l, 64)
    q_comps = jnp.asarray(q_comps_np, jnp.int32)
    q_vals = jnp.asarray(q_vals_np, jnp.float32)
    B = args.batch
    V = arrays.list_vocab.shape[1]
    LLMAX = ll_pad_for(arrays.max_list_len)
    sc = args.sc
    pool = args.pool
    k = 10

    t0 = time.time()
    plan = plan_grouped(q_comps_np, q_vals_np, ctx, args.qc, M=args.m)
    t_plan = time.time() - t0
    print(f"plan: G={plan.G} W={plan.W} G_cap={plan.G_cap} "
          f"W_cap={plan.W_cap} host={t_plan*1e3:.2f}ms", file=sys.stderr)
    print(f"streamed/query: "
          f"{plan.W*128*arrays.doc_tiles.shape[1]/B/1e3:.0f} KB",
          file=sys.stderr)
    dplan = DevicePlan.put(plan)
    _sync(dplan.slot_b)
    G_cap, M = plan.G_cap, plan.M
    QC = plan.pair_slot.shape[1]

    def qparts(qc_arr, qv_arr):
        valid_q = qc_arr != PAD_COMPONENT
        qv = jnp.where(valid_q, qv_arr, 0.0)
        top_v, top_p = jax.lax.top_k(qv, sc)
        top_c = jnp.take_along_axis(qc_arr, top_p, axis=1)
        return qv, top_c, top_v

    @jax.jit
    def s1_qloc(ix, pl, qc_arr, qv_arr):
        qv, top_c, top_v = qparts(qc_arr, qv_arr)
        vocab = ix.list_vocab[pl.pair_list].astype(jnp.int32)
        qloc_pairs = E._qloc_compare(vocab, qc_arr, qv, sc)
        return qloc_pairs.sum()

    @jax.jit
    def s2_slots(ix, pl, qc_arr, qv_arr):
        qv, top_c, top_v = qparts(qc_arr, qv_arr)
        vocab = ix.list_vocab[pl.pair_list].astype(jnp.int32)
        qloc_pairs = E._qloc_compare(vocab, qc_arr, qv, sc)
        qloc = qloc_pairs.reshape(B * QC, V)[pl.slot_pair].reshape(
            G_cap, M, V)
        return qloc.sum()

    def to_kernel(ix, pl, qc_arr, qv_arr):
        qv, top_c, top_v = qparts(qc_arr, qv_arr)
        vocab = ix.list_vocab[pl.pair_list].astype(jnp.int32)
        qloc_pairs = E._qloc_compare(vocab, qc_arr, qv, sc)
        qloc = qloc_pairs.reshape(B * QC, V)[pl.slot_pair].reshape(
            G_cap, M, V)
        scores = score_grouped_pallas(
            ix.doc_tiles_aligned, ix.tile_scale3d, qloc,
            pl.work_region, pl.work_g, pl.work_s, LLMAX,
            interpret=jax.default_backend() != "tpu",
        )
        return qv, top_c, top_v, scores

    @jax.jit
    def s3_kernel(ix, pl, qc_arr, qv_arr):
        _, _, _, scores = to_kernel(ix, pl, qc_arr, qv_arr)
        return scores.sum()

    def to_pool(ix, pl, qc_arr, qv_arr):
        qv, top_c, top_v, scores = to_kernel(ix, pl, qc_arr, qv_arr)
        pv = scores.reshape(G_cap * M, LLMAX)[
            pl.pair_slot.reshape(B * QC)].reshape(B, QC, LLMAX)
        rows_ok = (
            jnp.arange(LLMAX, dtype=jnp.int32)[None, None, :]
            < pl.pair_len[..., None]
        ) & pl.pair_valid[..., None]
        pv = jnp.where(rows_ok, pv, -jnp.inf).reshape(B, QC * LLMAX)
        return qv, top_c, top_v, pv

    @jax.jit
    def s4_regroup(ix, pl, qc_arr, qv_arr):
        _, _, _, pv = to_pool(ix, pl, qc_arr, qv_arr)
        return jnp.where(jnp.isfinite(pv), pv, 0.0).sum()

    @jax.jit
    def s5_topk(ix, pl, qc_arr, qv_arr):
        _, _, _, pv = to_pool(ix, pl, qc_arr, qv_arr)
        top_scores, sel = jax.lax.top_k(pv, pool)
        return jnp.where(jnp.isfinite(top_scores), top_scores, 0.0).sum() \
            + sel.sum()

    @jax.jit
    def s6_ovf(ix, pl, qc_arr, qv_arr):
        from ..search.grouped import _ovf_correction

        qv, top_c, top_v, pv = to_pool(ix, pl, qc_arr, qv_arr)
        top_scores, sel = jax.lax.top_k(pv, pool)
        qc_slot = sel // LLMAX
        off = sel % LLMAX
        post_sel = jnp.take_along_axis(pl.pair_pstart, qc_slot, axis=1) + off
        safe_post = jnp.clip(post_sel, 0, ix.postings.shape[0] - 1)
        top_scores = _ovf_correction(ix, top_c, top_v, top_scores, safe_post)
        return jnp.where(jnp.isfinite(top_scores), top_scores, 0.0).sum()

    @jax.jit
    def s7_full(ix, pl, qc_arr, qv_arr):
        gp = GroupedParams(k=k, score_cut=sc, pool=pool)
        from ..search.grouped import _grouped_impl

        s, i = _grouped_impl(ix, pl, qc_arr, qv_arr, gp)
        return jnp.where(jnp.isfinite(s), s, 0.0).sum() + i.sum()

    stages = [
        ("1 qloc pairs", s1_qloc),
        ("2 +slot expand", s2_slots),
        ("3 +grouped kernel", s3_kernel),
        ("4 +regroup/mask", s4_regroup),
        ("5 +pool topk", s5_topk),
        ("6 +ovf rerank", s6_ovf),
        ("7 full program", s7_full),
    ]
    prev = 0.0
    for name, fn in stages:
        t, _ = _timeit(fn, index, dplan, q_comps, q_vals, reps=args.reps)
        print(f"{name:>20}: {t*1e3:8.2f} ms  "
              f"(delta {1e3*(t-prev):+8.2f} ms)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
