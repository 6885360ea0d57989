"""Round-4 probe B, one TPU session: finish the 150K-at-the-bar grid
that probe_r4a started (the r4a session died before its stages 5-6).

r4a results (W=512, B=16384, 100K docs):
  hier  M8  qc13 p96/r64   84,015 QPS @ 0.9701   (round-3 at-bar point)
  hier  M16 qc13 p96/r64   94,271 QPS @ 0.9701   <- M16 is +12% free
  hier  M8  qc14 p96/r64   87,976 QPS @ 0.9719
  stride2   qc14 p128/r96  68,295 QPS @ 0.9764   (best recall rung)

Open questions this probe decides on device:
  1. M16 x {qc14 p96/r64, qc13/14 p128/r96, stride2 qc14 p128/r96}:
     does the M16 win compose with the deeper/recall-richer rungs?
  2. M32 hier qc13 p96/r64: does a bigger group size keep paying at
     B=16384, or do groups stop filling?
  3. rowmajor qloc at the M16 winner (r4a stage 5, never ran).
  4. stage budgets at the M16 winner (r4a stage 6, never ran) — where
     the remaining ms go decides the next kernel investment.

Usage: python -m seismic_tpu.harness.probe_r4b [width ...]
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

        def run(gp, qcut, B_=B, reps=4, with_recall=True, M=16):
            qn, vn = q_comps[:B_], q_vals[:B_]
            qd = jnp.asarray(qn, jnp.int32)
            vd = jnp.asarray(vn, jnp.float32)
            gc, wc = plan_caps(qn, vn, ctx, qcut, M=M)
            out = search_grouped_derive_jit(
                index, qd, vd, gp, qcut, M, gc, wc, ctx.zero_region)
            _sync(out)
            t0 = time.time()
            for _ in range(reps):
                out = search_grouped_derive_jit(
                    index, qd, vd, gp, qcut, M, gc, wc, ctx.zero_region)
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

        # ---- 1: M16 x the deeper/recall-richer rungs ----
        for qcut, pool, resc in ((13, 96, 64), (14, 96, 64),
                                 (13, 128, 96), (14, 128, 96)):
            gp = dataclasses.replace(base_gp, pool=pool, rescore=resc)
            grid(f"M16 hier p{pool}/r{resc}", gp, qcut)
        for qcut in (13, 14):
            gp = dataclasses.replace(
                base_gp, pool=128, rescore=96, pool_mode="stride",
                pool_per_pair=0, pool_stride=2, pool_select="approx")
            grid("M16 stride2 p128/r96", gp, qcut)

        # ---- 2: M32 at the winner ----
        gp = dataclasses.replace(base_gp)
        grid("M32 hier p96/r64", gp, 13, M=32)
        grid("M32 hier p96/r64", gp, 14, M=32)

        # ---- 3: rowmajor qloc at the M16 winner ----
        gp = dataclasses.replace(base_gp, qloc_mode="rowmajor")
        grid("M16 ROWMAJ hier p96/r64", gp, 13)

        # ---- 4: stage budgets at the M16 winner ----
        for stage in ("qloc", "expand", "kernel", "regroup", "pool",
                      "prerank", "full"):
            gp = dataclasses.replace(
                base_gp, stop_after="" if stage == "full" else stage)
            try:
                dt, _ = run(gp, 13, reps=3, with_recall=False)
                log(f"  B={B} W{W} M16 hier p96/r64 {stage:7s}: "
                    f"{dt*1e3:6.2f} ms")
            except Exception as e:  # noqa: BLE001
                log(f"  stage {stage}: FAILED {type(e).__name__}: {e}")

        del index
        import gc as _gc

        _gc.collect()


if __name__ == "__main__":
    main()
