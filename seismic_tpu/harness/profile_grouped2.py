"""Isolated per-stage profiling of the grouped search path.

Unlike profile_grouped (cumulative prefixes, which XLA can partially
dead-code-eliminate when the returned reduction is algebraically
collapsible), every stage here is its own jitted function taking the
PREVIOUS stage's materialized device arrays as inputs and returning its
real output — no cross-stage fusion, no DCE.

Usage: python -m seismic_tpu.harness.profile_grouped2 [--batch 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")


def _sync(out):
    """Force completion WITHOUT a device->host copy of the value (axon's
    block_until_ready is async; np.asarray of a multi-GB leaf would pull
    it through the ~20 MB/s tunnel): reduce to a scalar on device and
    fetch 4 bytes."""
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "shape")]
    if leaves:
        x = leaves[0]
        # dtype= makes XLA fuse the convert into the reduce (an astype
        # would materialize a f32 copy of multi-GB int8 operands)
        np.asarray(jnp.sum(x, dtype=jnp.float32))
    return out


def _timeit(fn, *args, reps=5):
    out = _sync(fn(*args))
    t0 = time.time()
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
    ap.add_argument("--ovf-pool", type=int, default=64)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..data.sparse import PAD_COMPONENT
    from ..ops.pallas_grouped import score_grouped_pallas
    from ..ops.pallas_qloc import LANES, project_qloc_pallas
    from ..ops_pallas_prep import ll_pad_for
    from ..search.grouped import (
        DevicePlan,
        _dedup_with_payload,
        _ovf_correction,
    )
    from ..search.engine import pad_queries
    from ..search.planner import PlannerContext, plan_grouped
    from ..types import IndexArrays
    from .synth import synth_queries

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    arrays = IndexArrays.load(args.index)
    t0 = time.time()
    index = arrays.to_device(pallas_tiles=True)
    _sync(index.doc_tiles_aligned)
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
    interp = jax.default_backend() != "tpu"

    plan = plan_grouped(q_comps_np, q_vals_np, ctx, args.qc, M=args.m)
    print(f"plan: G={plan.G} W={plan.W} G_cap={plan.G_cap} "
          f"W_cap={plan.W_cap}", file=sys.stderr, flush=True)
    dplan = DevicePlan.put(plan)
    _sync(dplan.packed)
    G_cap, M = plan.G_cap, plan.M
    QC = plan.pair_slot.shape[1]
    P = B * QC
    P_cap = -(-P // LANES) * LANES
    n_docs = index.n_docs

    # ---------- stage functions (inputs = previous stage outputs) ----------
    @jax.jit
    def f0_top(qc_arr, qv_arr):
        valid_q = qc_arr != PAD_COMPONENT
        qv = jnp.where(valid_q, qv_arr, 0.0)
        top_v, top_p = jax.lax.top_k(qv, sc)
        top_c = jnp.take_along_axis(qc_arr, top_p, axis=1)
        return top_c, top_v

    @jax.jit
    def f1_vocab(ix, pl):
        pl = pl.view()
        return ix.list_vocab[pl.pair_list.reshape(P)].astype(jnp.int32).T

    @jax.jit
    def f2_qprep(top_c, top_v):
        qcT = jnp.broadcast_to(top_c[:, None, :sc], (B, QC, sc)).reshape(
            P, sc).T
        qvT = jnp.broadcast_to(top_v[:, None, :sc], (B, QC, sc)).reshape(
            P, sc).T
        if P_cap > P:
            qcT = jnp.pad(qcT, ((0, 0), (0, P_cap - P)),
                          constant_values=PAD_COMPONENT)
            qvT = jnp.pad(qvT, ((0, 0), (0, P_cap - P)))
        return qcT, qvT

    @jax.jit
    def f3_qloc_kernel(vocabT, qcT, qvT):
        vT = vocabT
        if P_cap > P:
            vT = jnp.pad(vT, ((0, 0), (0, P_cap - P)))
        return project_qloc_pallas(vT, qcT, qvT, sc, interpret=interp)

    @jax.jit
    def f4_expand(qlocT, pl):
        pl = pl.view()
        qloc_pairs = qlocT.T[:P]
        qloc = qloc_pairs[pl.slot_pair].reshape(G_cap, M, V)
        qsum_pairs = 128.0 * jnp.sum(qloc_pairs, axis=-1)
        qsum = jnp.broadcast_to(
            qsum_pairs[pl.slot_pair].reshape(G_cap, M, 1), (G_cap, M, 128)
        )
        return qloc, qsum

    @jax.jit
    def f5_kernel(ix, pl, qloc, qsum):
        pl = pl.view()
        return score_grouped_pallas(
            ix.doc_tiles_aligned, ix.tile_scale3d, qloc,
            pl.work_region, pl.work_g, pl.work_s, LLMAX,
            interpret=interp, compute_dtype=args.dtype, qsum=qsum,
        )

    @jax.jit
    def f6_regroup(scores, pl):
        pl = pl.view()
        pv = scores.reshape(G_cap * M, LLMAX)[
            pl.pair_slot.reshape(P)].reshape(B, QC, LLMAX)
        rows_ok = (
            jnp.arange(LLMAX, dtype=jnp.int32)[None, None, :]
            < pl.pair_len[..., None]
        ) & pl.pair_valid[..., None]
        return jnp.where(rows_ok, pv, -jnp.inf).reshape(B, QC * LLMAX)

    @jax.jit
    def f7_topk(pv, pl, ix):
        pl = pl.view()
        top_scores, sel = jax.lax.top_k(pv, pool)
        qc_slot = sel // LLMAX
        off = sel % LLMAX
        post_sel = jnp.take_along_axis(
            pl.pair_pstart, qc_slot, axis=1) + off
        safe_post = jnp.clip(post_sel, 0, ix.postings.shape[0] - 1)
        cand_ids = jnp.take(ix.postings, safe_post)
        cand_ids = jnp.where(jnp.isfinite(top_scores), cand_ids, n_docs)
        return top_scores, cand_ids, safe_post

    @jax.jit
    def f8_dedup(top_scores, cand_ids, safe_post):
        return _dedup_with_payload(top_scores, cand_ids, safe_post, n_docs)

    @jax.jit
    def f9_ovf(ix, dscores, dids, dpost, top_c, top_v):
        t2, pos2 = jax.lax.top_k(dscores, args.ovf_pool)
        ids2 = jnp.take_along_axis(dids, pos2, axis=1)
        post2 = jnp.take_along_axis(dpost, pos2, axis=1)
        t2 = _ovf_correction(ix, top_c, top_v, t2, post2)
        out_scores, opos = jax.lax.top_k(t2, k)
        out_ids = jnp.take_along_axis(ids2, opos, axis=1)
        return jnp.where(jnp.isfinite(out_scores), out_scores, 0.0), out_ids

    # ---------- run ----------
    t, (top_c, top_v) = _timeit(f0_top, q_comps, q_vals, reps=args.reps)
    print(f"0 top_k terms      : {t*1e3:7.2f} ms", flush=True)
    t, vocabT = _timeit(f1_vocab, index, dplan, reps=args.reps)
    print(f"1 vocab gather     : {t*1e3:7.2f} ms", flush=True)
    t, (qcT, qvT) = _timeit(f2_qprep, top_c, top_v, reps=args.reps)
    print(f"2 term spread      : {t*1e3:7.2f} ms", flush=True)
    t, qlocT = _timeit(f3_qloc_kernel, vocabT, qcT, qvT, reps=args.reps)
    print(f"3 qloc kernel      : {t*1e3:7.2f} ms", flush=True)
    t, (qloc, qsum) = _timeit(f4_expand, qlocT, dplan, reps=args.reps)
    print(f"4 slot expand+qsum : {t*1e3:7.2f} ms", flush=True)
    t, scores = _timeit(f5_kernel, index, dplan, qloc, qsum,
                        reps=args.reps)
    print(f"5 grouped kernel   : {t*1e3:7.2f} ms", flush=True)
    t, pv = _timeit(f6_regroup, scores, dplan, reps=args.reps)
    print(f"6 regroup+mask     : {t*1e3:7.2f} ms", flush=True)
    t, (top_scores, cand_ids, safe_post) = _timeit(
        f7_topk, pv, dplan, index, reps=args.reps)
    print(f"7 pool topk+ids    : {t*1e3:7.2f} ms", flush=True)
    t, (dscores, dids, dpost) = _timeit(
        f8_dedup, top_scores, cand_ids, safe_post, reps=args.reps)
    print(f"8 dedup            : {t*1e3:7.2f} ms", flush=True)
    t, _ = _timeit(f9_ovf, index, dscores, dids, dpost, top_c, top_v,
                   reps=args.reps)
    print(f"9 ovf+final topk   : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
