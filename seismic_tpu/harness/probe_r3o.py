"""Round-3 probe O, one TPU session: NARROWED truncated-vocab tiles
(ops/pallas_tiles.py::narrow_vocab) on the 100K bench — the exact-
mechanism replacement for the dead hashed-tile family (probe_r3l/m/n).

CPU study (probe_r3n, union-pool simulator validated vs device):
  V0=512 @ qc=14 pool64/r48 = 0.9730, qc=13 pool128/r96 = 0.9781
  V0=768 @ qc=12 pool64/r48 = 0.9742
Half/three-quarter tile width cuts the kernel + qloc + expand stages
proportionally; this probe measures the realized e2e QPS x recall on
the device grid, the stride-pool variant (8x smaller pool input), a
rescore-depth ladder, and the stage budget at the best point.

Usage: python -m seismic_tpu.harness.probe_r3o [width ...]
  width in {512, 768, 1024}; loads
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

    widths = [int(a) for a in sys.argv[1:]] or [512, 768]
    base = os.path.join(bench.CACHE, "index_100000_30522_200_v1024_o64")
    log("devices:", jax.devices())
    ds = bench.get_dataset()
    q_comps, q_vals = bench.get_queries(bench.DIM)
    gt_ids = bench.get_ground_truth(ds, q_comps, q_vals)
    del ds

    base_gp = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                            compute_dtype="i8", pool_mode="hier",
                            pool_per_pair=16, kernel_unroll=8)

    for W in widths:
        path = base + ".dir" if W == 1024 else base + f"_nw{W}.dir"
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

        def run(gp, qcut, B_, reps=6, with_recall=True):
            qn, vn = q_comps[:B_], q_vals[:B_]
            qd = jnp.asarray(qn, jnp.int32)
            vd = jnp.asarray(vn, jnp.float32)
            gc, wc = plan_caps(qn, vn, ctx, qcut, M=8)
            out = search_grouped_derive_jit(
                index, qd, vd, gp, qcut, 8, gc, wc, ctx.zero_region)
            _sync(out)
            t0 = time.time()
            for _ in range(reps):
                out = search_grouped_derive_jit(
                    index, qd, vd, gp, qcut, 8, gc, wc, ctx.zero_region)
            _sync(out)
            dt = (time.time() - t0) / reps
            rec = -1.0
            if with_recall:
                ids = np.asarray(out[1])
                g = gt_ids[: min(B_, len(gt_ids))]
                rec = recall_at_k(ids[: len(g)], g)
            return dt, rec

        B = 16384
        qcuts = (12, 13, 14) if W == 512 else ((12, 13) if W == 768
                                               else (11, 12))
        for qcut in qcuts:
            for mode in ("hier", "stride"):
                for pool, resc in ((64, 32), (64, 48), (96, 64),
                                   (128, 96)):
                    gp = dataclasses.replace(
                        base_gp, pool=pool, rescore=resc, pool_mode=mode,
                        pool_per_pair=16 if mode == "hier" else 0)
                    try:
                        dt, rec = run(gp, qcut, B, reps=4)
                        log(f"e2e B={B} W{W} {mode} U8 qc{qcut} "
                            f"pool{pool}/r{resc}: {dt*1e3:7.2f} ms  "
                            f"recall@10={rec:.4f} QPS={B/dt:,.0f}")
                    except Exception as e:  # noqa: BLE001
                        log(f"W{W} {mode} qc{qcut} p{pool}/r{resc}: "
                            f"FAILED {type(e).__name__}: {e}")

        # row-major qloc kernel (a0c2a07, unmeasured on device): drops
        # the lane-major transpose from the qloc chain; i8-only
        for mode in ("hier", "stride"):
            for pool, resc in ((64, 48), (128, 96)):
                gp = dataclasses.replace(
                    base_gp, pool=pool, rescore=resc, pool_mode=mode,
                    pool_per_pair=16 if mode == "hier" else 0,
                    qloc_mode="rowmajor")
                try:
                    dt, rec = run(gp, qcuts[-1], B, reps=4)
                    log(f"e2e B={B} W{W} {mode} ROWMAJ qc{qcuts[-1]} "
                        f"pool{pool}/r{resc}: {dt*1e3:7.2f} ms  "
                        f"recall@10={rec:.4f} QPS={B/dt:,.0f}")
                except Exception as e:  # noqa: BLE001
                    log(f"W{W} rowmajor {mode} p{pool}/r{resc}: "
                        f"FAILED {type(e).__name__}: {e}")

        # stage budget at the width's cheapest >=0.972 point (assume
        # qc=max, pool64/r48 stride; adjust offline from the grid above)
        for stage in ("qloc", "expand", "kernel", "regroup", "pool",
                      "prerank", "full"):
            gp = dataclasses.replace(
                base_gp, pool_mode="stride",
                stop_after=None if stage == "full" else stage)
            try:
                dt, _ = run(gp, qcuts[-1], B, reps=3, with_recall=False)
                log(f"  B={B} W{W} stride U8 {stage:7s}: {dt*1e3:6.2f} ms")
            except Exception as e:  # noqa: BLE001
                log(f"  stage {stage}: FAILED {type(e).__name__}: {e}")

        # one B=4096 reference point (batch-scaling check)
        try:
            dt, rec = run(dataclasses.replace(base_gp, pool_mode="stride",
                                              pool_per_pair=0),
                          qcuts[-1], 4096, reps=8)
            log(f"e2e B=4096 W{W} stride U8 qc{qcuts[-1]} pool64/r48: "
                f"{dt*1e3:7.2f} ms  recall@10={rec:.4f} QPS={4096/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"W{W} B=4096: FAILED {type(e).__name__}: {e}")

        del index
        import gc as _gc

        _gc.collect()


if __name__ == "__main__":
    main()
