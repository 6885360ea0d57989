"""Round-4 probe A, one TPU session: the 150K-at-the-bar operating grid
(VERDICT r3 ask #3/#7) on the 100K bench cache.

Round 3's honest at-bar point is qc=13 hier pool96/r64 at ~92.5K QPS
(probe_r3o); the stride pool reached 132K QPS but lost ~3 recall points
at pool_stride=8. Hypotheses this probe decides on device:

  1. stride at SMALL strides: pool_stride=2 conflates only rows 128
     apart (in-kernel, zero extra cost; rx=1 so no XLA window max) —
     256 candidates/pair at LLMAX=512 should hold hier-level recall at
     close to stride-level cost. pool_stride=4 is the midpoint.
  2. pool_select="approx" for the stride modes (the [B, QC*NW] exact
     top_k is the widest sort left in the tail).
  3. M=16 groups at B=16384: halves the hot lists' tile streaming
     (round-3 measured M=16 NEGATIVE at B=4096 where groups don't
     fill; at 4x the batch the fill fraction doubles).
  4. weighted=True list selection (value * per-list max) — buys ~one
     query_cut step of reachability (engine-path measurement, round 2);
     never measured on the grouped derive path.
  5. rowmajor qloc at the surviving configs (landed a0c2a07).
  6. stage budget at the round-3 at-bar config and at this round's
     winner.

Usage: python -m seismic_tpu.harness.probe_r4a [width ...]
  width in {512, 1024}; loads
  .bench_cache/index_100000_30522_200_v1024_o64[_nw{width}].dir
"""
from __future__ import annotations

import dataclasses
import faulthandler
import os
import sys
import time

import numpy as np

faulthandler.dump_traceback_later(6600, exit=True)
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)


def main():
    import bench
    from bench import _sync, log, recall_at_k

    import jax
    import jax.numpy as jnp

    from seismic_tpu.search.grouped import (
        GroupedParams,
        plan_caps,
        search_grouped_derive_jit,
    )
    from seismic_tpu.search.planner import PlannerContext
    from seismic_tpu.types import IndexArrays

    widths = [int(a) for a in sys.argv[1:]] or [512]
    base = os.path.join(bench.CACHE, "index_100000_30522_200_v1024_o64")
    log("devices:", jax.devices())
    ds = bench.get_dataset()
    q_comps, q_vals = bench.get_queries(bench.DIM)
    gt_ids = bench.get_ground_truth(ds, q_comps, q_vals)
    del ds

    base_gp = GroupedParams(k=10, score_cut=64, pool=96, rescore=64,
                            compute_dtype="i8", pool_mode="hier",
                            pool_per_pair=16, kernel_unroll=8)
    B = 16384

    for W in widths:
        path = base + ".dir" if W == 1024 else base + f"_nw{W}.dir"
        if not os.path.isdir(path):
            log(f"[W={W}] MISSING {path}; skipping")
            continue
        t0 = time.time()
        arrays = IndexArrays.load_dir(path)
        for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
                  "summary_codes", "dense_summary", "dense_scale",
                  "block_sketch", "block_sketch_scale", "doc_sketch",
                  "doc_sketch_scale"):
            setattr(arrays, f, None)
        index = arrays.to_device(pallas_tiles=True, tile_csub=bench.CSUB)
        ctx = PlannerContext.from_arrays(arrays, csub=bench.CSUB)
        _sync(index.doc_tiles_aligned)
        log(f"[W={W}] load+to_device+ctx: {time.time()-t0:.1f}s")

        def run(gp, qcut, B_=B, reps=4, with_recall=True, M=8,
                weighted=False):
            qn, vn = q_comps[:B_], q_vals[:B_]
            qd = jnp.asarray(qn, jnp.int32)
            vd = jnp.asarray(vn, jnp.float32)
            gc, wc = plan_caps(qn, vn, ctx, qcut, M=M, weighted=weighted)
            out = search_grouped_derive_jit(
                index, qd, vd, gp, qcut, M, gc, wc, ctx.zero_region,
                weighted=weighted)
            _sync(out)
            t0 = time.time()
            for _ in range(reps):
                out = search_grouped_derive_jit(
                    index, qd, vd, gp, qcut, M, gc, wc, ctx.zero_region,
                    weighted=weighted)
            _sync(out)
            dt = (time.time() - t0) / reps
            rec = -1.0
            if with_recall:
                ids = np.asarray(out[1])
                g = gt_ids[: min(B_, len(gt_ids))]
                rec = recall_at_k(ids[: len(g)], g)
            return dt, rec

        def grid(label, gp, qcut, **kw):
            try:
                dt, rec = run(gp, qcut, **kw)
                log(f"e2e B={kw.get('B_', B)} W{W} {label} qc{qcut}: "
                    f"{dt*1e3:7.2f} ms  recall@10={rec:.4f} "
                    f"QPS={kw.get('B_', B)/dt:,.0f}")
            except Exception as e:  # noqa: BLE001
                log(f"W{W} {label} qc{qcut}: FAILED "
                    f"{type(e).__name__}: {e}")

        # ---- 1+2: small-stride pool grid (pool_select approx/exact) ----
        for qcut in (13, 14):
            for ps in (2, 4, 8):
                for pool, resc in ((96, 64), (128, 96)):
                    for sel in ("approx", "exact"):
                        gp = dataclasses.replace(
                            base_gp, pool=pool, rescore=resc,
                            pool_mode="stride", pool_per_pair=0,
                            pool_stride=ps, pool_select=sel)
                        grid(f"stride{ps}/{sel} p{pool}/r{resc}",
                             gp, qcut)
            # hier reference point at the same qc
            gp = dataclasses.replace(base_gp, pool=96, rescore=64)
            grid("hier16 p96/r64", gp, qcut)

        # ---- 3: M=16 at B=16384 ----
        for mode, ps in (("hier", 0), ("stride", 2)):
            gp = dataclasses.replace(
                base_gp, pool=96, rescore=64, pool_mode=mode,
                pool_per_pair=16 if mode == "hier" else 0,
                pool_stride=ps or 8,
                pool_select="approx" if mode == "stride" else "exact")
            grid(f"M16 {mode}{ps or ''} p96/r64", gp, 13, M=16)

        # ---- 4: weighted list selection ----
        for qcut in (11, 12, 13):
            gp = dataclasses.replace(
                base_gp, pool=96, rescore=64, pool_mode="stride",
                pool_per_pair=0, pool_stride=2, pool_select="approx")
            grid(f"WEIGHTED stride2 p96/r64", gp, qcut, weighted=True)

        # ---- 5: rowmajor qloc at the candidate winners ----
        for mode, ps in (("hier", 0), ("stride", 2)):
            gp = dataclasses.replace(
                base_gp, pool=96, rescore=64, pool_mode=mode,
                pool_per_pair=16 if mode == "hier" else 0,
                pool_stride=ps or 8,
                pool_select="approx" if mode == "stride" else "exact",
                qloc_mode="rowmajor")
            grid(f"ROWMAJ {mode}{ps or ''} p96/r64", gp, 13)

        # ---- 6: stage budgets (round-3 at-bar config + stride2) ----
        for mode, ps in (("hier", 0), ("stride", 2)):
            for stage in ("qloc", "expand", "kernel", "regroup", "pool",
                          "prerank", "full"):
                gp = dataclasses.replace(
                    base_gp, pool=96, rescore=64, pool_mode=mode,
                    pool_per_pair=16 if mode == "hier" else 0,
                    pool_stride=ps or 8,
                    pool_select="approx" if mode == "stride" else "exact",
                    stop_after="" if stage == "full" else stage)
                try:
                    dt, _ = run(gp, 13, reps=3, with_recall=False)
                    log(f"  B={B} W{W} {mode}{ps or ''} p96/r64 "
                        f"{stage:7s}: {dt*1e3:6.2f} ms")
                except Exception as e:  # noqa: BLE001
                    log(f"  stage {stage}: FAILED {type(e).__name__}: {e}")

        del index
        import gc as _gc

        _gc.collect()


if __name__ == "__main__":
    main()
