"""A/B benchmark on the real device: round-1 tiles/Pallas path vs the
round-2 grouped path, at the headline bench operating point.

Usage: python -m seismic_tpu.harness.bench_grouped [--qc 11] [--batch 1024]
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
    np.asarray(leaves[0]).ravel()[:1]
    return out


def recall_at_k(ids, gt_ids, k=10):
    hits = tot = 0
    for r, g in zip(ids, gt_ids):
        rs = {int(x) for x in r[:k] if x >= 0}
        gs = {int(x) for x in g[:k] if x >= 0}
        hits += len(rs & gs)
        tot += len(gs)
    return hits / max(tot, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default=os.path.join(
        ROOT, ".bench_cache", "index_100000_30522_200_v1024_o64.dir"))
    ap.add_argument("--gt", default=os.path.join(
        ROOT, ".bench_cache", "gt_100000_30522_1024.npz"))
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--qc", type=int, default=11)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--pair-top", type=int, default=16)
    ap.add_argument("--pool", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtype", default="bf16",
                    choices=["bf16", "f32", "i8"])
    ap.add_argument("--sc", type=int, default=64)
    ap.add_argument("--rescore", type=int, default=0)
    ap.add_argument("--pool-mode", default="approx",
                    choices=["approx", "exact"])
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..search.engine import SearchParams, pad_queries, search_batch_jit
    from ..search.grouped import (
        DevicePlan,
        GroupedParams,
        search_grouped_jit,
    )
    from ..search.planner import PlannerContext, plan_grouped
    from ..types import IndexArrays
    from .synth import synth_queries

    print("devices:", jax.devices(), file=sys.stderr)
    t0 = time.time()
    arrays = IndexArrays.load(args.index)
    print(f"load: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    index = arrays.to_device(pallas_tiles=True)
    ctx = PlannerContext.from_arrays(arrays)
    print(f"to_device+ctx: {time.time()-t0:.1f}s", file=sys.stderr)

    B = args.batch
    qc_l, qv_l = synth_queries(1024, dim=arrays.dim, seed=11)
    q_comps_np, q_vals_np = pad_queries(qc_l, qv_l, 64)
    gt = np.load(args.gt)["ids"] if os.path.exists(args.gt) else None
    # tile the queries up to the requested batch size
    if B != 1024:
        repsq = -(-B // 1024)
        q_comps_np = np.tile(q_comps_np, (repsq, 1))[:B]
        q_vals_np = np.tile(q_vals_np, (repsq, 1))[:B]
    q_comps = jnp.asarray(q_comps_np, jnp.int32)
    q_vals = jnp.asarray(q_vals_np, jnp.float32)

    # ---- grouped path ----
    t0 = time.time()
    plan = plan_grouped(q_comps_np, q_vals_np, ctx, args.qc, M=args.m)
    t_plan = time.time() - t0
    print(f"plan: G={plan.G} W={plan.W} G_cap={plan.G_cap} "
          f"W_cap={plan.W_cap} host={t_plan*1e3:.2f}ms", file=sys.stderr)
    bytes_streamed = plan.W * 128 * arrays.doc_tiles.shape[1]
    print(f"streamed/query: {bytes_streamed/B/1e3:.0f} KB", file=sys.stderr)
    t0 = time.time()
    dplan = DevicePlan.put(plan)
    _sync(dplan.packed)
    print(f"plan upload: {(time.time()-t0)*1e3:.1f}ms", file=sys.stderr)

    gp = GroupedParams(k=10, score_cut=args.sc, pool=args.pool,
                       compute_dtype=args.dtype, rescore=args.rescore,
                       pool_mode=args.pool_mode)
    t0 = time.time()
    out = search_grouped_jit(index, dplan, q_comps, q_vals, gp)
    _sync(out)
    print(f"grouped compile+run1: {time.time()-t0:.1f}s", file=sys.stderr)
    if gt is not None and B == 1024:
        r = recall_at_k(np.asarray(out[1]), gt)
        print(f"grouped recall@10 = {r:.4f}")

    # timed: queue reps then sync
    t0 = time.time()
    for _ in range(args.reps):
        out = search_grouped_jit(index, dplan, q_comps, q_vals, gp)
    _sync(out)
    dt = (time.time() - t0) / args.reps
    print(f"grouped: {dt*1e3:.2f} ms/batch -> {B/dt:.0f} QPS "
          f"(+host plan {t_plan*1e3:.1f}ms)")

    # with host planning in the loop (fresh plan per batch, same queries)
    t0 = time.time()
    for _ in range(args.reps):
        plan2 = plan_grouped(q_comps_np, q_vals_np, ctx, args.qc, M=args.m)
        dplan2 = DevicePlan.put(plan2)
        out = search_grouped_jit(index, dplan2, q_comps, q_vals, gp)
    _sync(out)
    dt2 = (time.time() - t0) / args.reps
    print(f"grouped e2e (plan+upload+search): {dt2*1e3:.2f} ms/batch "
          f"-> {B/dt2:.0f} QPS")

    # ---- reference: round-1 tiles path ----
    if not args.skip_ref:
        params = SearchParams(
            k=10, query_cut=args.qc, block_budget=0, block_mode="dense",
            doc_mode="tiles", full_lists=True, score_cut=64,
            dedup_pool=128, use_pallas=True,
        )
        t0 = time.time()
        out = search_batch_jit(index, q_comps, q_vals, jnp.float32(0.0),
                               params, 128, 42)
        _sync(out)
        print(f"tiles compile+run1: {time.time()-t0:.1f}s", file=sys.stderr)
        if gt is not None and B == 1024:
            r = recall_at_k(np.asarray(out[1]), gt)
            print(f"tiles recall@10 = {r:.4f}")
        t0 = time.time()
        for _ in range(args.reps):
            out = search_batch_jit(index, q_comps, q_vals, jnp.float32(0.0),
                                   params, 128, 42)
        _sync(out)
        dt = (time.time() - t0) / args.reps
        print(f"tiles(r1): {dt*1e3:.2f} ms/batch -> {B/dt:.0f} QPS")


if __name__ == "__main__":
    main()
