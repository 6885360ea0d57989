"""Round-3 stage attribution of the grouped path at the BENCH operating
point (B=4096, qc=11, i8 + hier pool + exact rescore, device-derived plan).

Two views in one TPU session (one index upload):
  1. stop_after deltas of the FUSED derive+search program — cumulative
     cost of each pipeline prefix (deltas approximate per-stage cost; XLA
     DCE makes truncated programs slightly optimistic).
  2. isolated microbenches of the candidate hot spots (rescore operands,
     approx_max_k, regroup gather) to rank round-3 optimizations.

Usage: python -m seismic_tpu.harness.profile_r3 [--batch 4096] [--qc 11]
"""

from __future__ import annotations

import argparse
import faulthandler
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")

faulthandler.dump_traceback_later(2700, exit=True)


def _sync(out):
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "shape")]
    if leaves:
        np.asarray(jnp.sum(leaves[0], dtype=jnp.float32))
    return out


def _timeit(fn, *args, reps=5, **kw):
    out = _sync(fn(*args, **kw))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
    _sync(out)
    return (time.time() - t0) / reps, out


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default=os.path.join(
        ROOT, ".bench_cache", "index_100000_30522_200_v1024_o64.dir"))
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--qc", type=int, default=11)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--csub", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..ops_pallas_prep import ll_pad_for
    from ..search.grouped import (
        GroupedParams,
        plan_caps,
        search_grouped_derive_jit,
    )
    from ..search.engine import pad_queries
    from ..search.planner import PlannerContext, plan_grouped
    from ..types import IndexArrays
    from .synth import synth_queries

    log("devices:", jax.devices())
    arrays = IndexArrays.load(args.index)
    # match bench.py upload set
    for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
              "summary_codes", "dense_summary", "dense_scale",
              "block_sketch", "block_sketch_scale", "doc_sketch",
              "doc_sketch_scale"):
        setattr(arrays, f, None)
    t0 = time.time()
    index = arrays.to_device(pallas_tiles=True, tile_csub=args.csub)
    _sync(index.doc_tiles_aligned)
    ctx = PlannerContext.from_arrays(arrays, csub=args.csub)
    log(f"to_device+ctx: {time.time()-t0:.1f}s")

    B = args.batch
    parts = []
    remaining, seed = B, 11
    while remaining > 0:
        n = min(1024, remaining)
        qc1, qv1 = synth_queries(n, dim=arrays.dim, seed=seed)
        parts.append(pad_queries(qc1, qv1, 64))
        remaining -= n
        seed += 1
    q_comps_np = np.concatenate([p[0] for p in parts])
    q_vals_np = np.concatenate([p[1] for p in parts])
    q_comps = jnp.asarray(q_comps_np, jnp.int32)
    q_vals = jnp.asarray(q_vals_np, jnp.float32)

    gc, wc = plan_caps(q_comps_np, q_vals_np, ctx, args.qc, M=8)
    plan = plan_grouped(q_comps_np, q_vals_np, ctx, args.qc, M=8)
    V = arrays.list_vocab.shape[1]
    LLMAX = ll_pad_for(arrays.max_list_len, args.csub)
    log(f"plan: G={plan.G} G_cap={gc} W={plan.W} W_cap={wc} "
        f"LLMAX={LLMAX} V={V} QC={args.qc} P={B*args.qc}")

    gp = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                       compute_dtype="i8", pool_mode="hier",
                       pool_per_pair=16)

    # ---- 1. stop_after deltas of the fused program ----
    stages = ["qloc", "expand", "kernel", "regroup", "pool", "prerank", ""]
    times = {}
    for st in stages:
        import dataclasses

        gps = dataclasses.replace(gp, stop_after=st)
        t, _ = _timeit(
            search_grouped_derive_jit, index, q_comps, q_vals, gps,
            args.qc, 8, gc, wc, ctx.zero_region, reps=args.reps,
        )
        times[st or "full"] = t * 1e3
        log(f"stop_after={st or 'full':8s}: {t*1e3:8.2f} ms")
    prev = 0.0
    log("--- deltas ---")
    for st in stages:
        name = st or "full"
        log(f"{name:8s}: +{times[name]-prev:7.2f} ms (cum {times[name]:.2f})")
        prev = times[name]

    # ---- 2. isolated microbenches ----
    log("--- microbenches ---")
    n_docs = index.n_docs

    # rescore_exact at the bench shape (48 ids/query)
    from ..ops.pallas_rescore import rescore_exact

    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, n_docs, size=(B, 48), dtype=np.int64)
    ids_dev = jnp.asarray(ids_np, jnp.int32)
    top_v, top_p = jax.lax.top_k(jnp.where(
        q_comps != np.int32(2**31 - 1), q_vals, 0.0), 64)
    top_c = jnp.take_along_axis(q_comps, top_p, axis=1)
    top_c, top_v = _sync((top_c, top_v))

    @jax.jit
    def f_rescore(ids, tc, tv):
        return rescore_exact(index, ids, tc, tv, 64)

    t, _ = _timeit(f_rescore, ids_dev, top_c, top_v, reps=args.reps)
    log(f"rescore_exact [B,48] sc=64:        {t*1e3:7.2f} ms")

    # the forward gather+decode alone (rescore's data movement)
    @jax.jit
    def f_gather(ids):
        flat = ids.reshape(-1)
        comps = index.fwd_comps[flat].astype(jnp.int32)
        vals = index.fwd_vals[flat].astype(jnp.float32)
        return comps.sum(dtype=jnp.int32), vals.sum(dtype=jnp.float32)

    t, _ = _timeit(f_gather, ids_dev, reps=args.reps)
    log(f"fwd gather+decode [B*48, 256]:     {t*1e3:7.2f} ms")

    # approx_max_k at pair-grid and slot-grid widths
    P = B * args.qc
    for rows, name in ((P, "pairs"), (gc * 8, "slots")):
        x = jnp.asarray(
            rng.standard_normal((rows, LLMAX), dtype=np.float32))
        x = _sync(x)

        @jax.jit
        def f_amk(x):
            return jax.lax.approx_max_k(x, 16, recall_target=0.98)

        t, _ = _timeit(f_amk, x, reps=args.reps)
        log(f"approx_max_k [{rows}, {LLMAX}] t=16 ({name}): {t*1e3:7.2f} ms")

    # regroup gather (pair_slot wide-row gather of [G_cap*M, LLMAX])
    src = jnp.asarray(rng.standard_normal((gc * 8, LLMAX), dtype=np.float32))
    sel = jnp.asarray(rng.integers(0, gc * 8, size=(P,), dtype=np.int64),
                      jnp.int32)
    src, sel = _sync((src, sel))

    @jax.jit
    def f_regroup(src, sel):
        return src[sel].sum(dtype=jnp.float32)

    t, _ = _timeit(f_regroup, src, sel, reps=args.reps)
    log(f"regroup gather [P={P}] rows of {LLMAX}: {t*1e3:7.2f} ms")

    # qloc pieces: vocab gather + transpose
    pair_list = jnp.asarray(plan.pair_list.reshape(-1), jnp.int32)
    pair_list = _sync(pair_list)

    @jax.jit
    def f_vocab_gather(pl):
        return index.list_vocab[pl].astype(jnp.int32).sum(dtype=jnp.int32)

    t, _ = _timeit(f_vocab_gather, pair_list, reps=args.reps)
    log(f"vocab gather [P, V]:               {t*1e3:7.2f} ms")

    @jax.jit
    def f_vocab_gather_T(pl):
        vT = index.list_vocab[pl].astype(jnp.int32).T
        return vT * 2  # force materialization of the transposed layout

    t, _ = _timeit(f_vocab_gather_T, pair_list, reps=args.reps)
    log(f"vocab gather + T materialized:     {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
