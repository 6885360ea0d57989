"""Round-4 probe D, one TPU session: the kNN-assisted headline grid
(VERDICT r3 ask #3) on the 100K bench cache.

probe_r4a's at-bar winner is M16 hier p96/r64 qc13 -> 94.3K QPS @
0.9701 (plain, no graph). The measured knn lifts (bench knn rung:
qc14 p64/r48 knn8 0.9688 -> 0.974 on W512; round 2 on W1024:
0.9725 -> 0.9818) say a CHEAP base rung + one refinement round can
clear the 0.97 bar well above 94K:

  1. base rungs qc in {10..13} x pools {64/48, 96/64} x n_knn
     {0, 8, 16} at B=16384 M16 hier: refine cost is one wide-row
     gather + one compare-kernel round over k*n_knn=80-160 rows/query
     (reference Knn::refine, inverted_index.rs:551-593) — if it costs
     <15% and lifts +1.5-3pt, qc10-12 bases reach the bar faster than
     plain qc13.
  2. stride2/approx bases (fastest pool family, r4a: qc13 0.9670 @
     76.8K at p128; stride8 0.9448 @ 98.7K) with knn16: does refine
     recover the stride pool's conflation losses?
  3. M16 + rowmajor qloc combos (r4a measured both wins separately:
     M16 94.3K, rowmajor-M8 90.9K vs baseline-M8 84.0K).
  4. the stage budget at the winner (r4a's timeout cut this off).

Usage: python -m seismic_tpu.harness.probe_r4d [width ...]
  width in {512, 1024}; loads
  .bench_cache/index_100000_30522_200_v1024_o64[_nw{width}].dir
  + the knn16 graph (.knn16.knn.seismic_tpu, built by the c100k stage).
"""
from __future__ import annotations

import dataclasses
import faulthandler
import json
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

    from seismic_tpu.search import knn as knn_mod
    from seismic_tpu.search.grouped import (
        GroupedParams,
        plan_caps,
        search_grouped_derive_jit,
    )
    from seismic_tpu.search.planner import PlannerContext
    from seismic_tpu.types import KNN_SUFFIX, IndexArrays

    widths = [int(a) for a in sys.argv[1:]] or [512]
    base = os.path.join(bench.CACHE, "index_100000_30522_200_v1024_o64")
    log("devices:", jax.devices())
    ds = bench.get_dataset()
    q_comps, q_vals = bench.get_queries(bench.DIM)
    gt_ids = bench.get_ground_truth(ds, q_comps, q_vals)
    del ds

    knn_path = base + ".knn16"
    knn_np = None
    if os.path.exists(knn_path + KNN_SUFFIX):
        knn_np = knn_mod.load_knn(knn_path)
        log(f"knn graph: {knn_np.shape} from {knn_path}")
    else:
        log(f"MISSING knn graph {knn_path}{KNN_SUFFIX}; n_knn rungs skip")

    base_gp = GroupedParams(k=10, score_cut=64, pool=96, rescore=64,
                            compute_dtype="i8", pool_mode="hier",
                            pool_per_pair=16, kernel_unroll=8)
    B = 16384
    rows = []

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
        if knn_np is not None:
            index = dataclasses.replace(
                index, knn=jax.device_put(jnp.asarray(knn_np)))
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
                qps = kw.get("B_", B) / dt
                log(f"e2e B={kw.get('B_', B)} W{W} {label} qc{qcut}: "
                    f"{dt*1e3:7.2f} ms  recall@10={rec:.4f} "
                    f"QPS={qps:,.0f}")
                rows.append({
                    "width": W, "label": label, "query_cut": qcut,
                    "ms": round(dt * 1e3, 2), "recall_at_10": round(rec, 4),
                    "qps": round(qps, 1),
                })
            except Exception as e:  # noqa: BLE001
                log(f"W{W} {label} qc{qcut}: FAILED "
                    f"{type(e).__name__}: {e}")

        # ---- 1: hier-M16 base x knn ladder ----
        knn_opts = (0, 8, 16) if knn_np is not None else (0,)
        for qcut in (10, 11, 12, 13):
            for pool, resc in ((64, 48), (96, 64)):
                for nk in knn_opts:
                    if nk == 0 and (pool, resc) == (64, 48) and qcut > 11:
                        continue  # plain shallow points known from r3o
                    gp = dataclasses.replace(
                        base_gp, pool=pool, rescore=resc, n_knn=nk)
                    grid(f"hierM16 p{pool}/r{resc} knn{nk}", gp, qcut)

        # ---- 2: stride2/approx base + knn16 ----
        if knn_np is not None:
            for qcut in (11, 12, 13):
                gp = dataclasses.replace(
                    base_gp, pool=96, rescore=64, pool_mode="stride",
                    pool_per_pair=0, pool_stride=2, pool_select="approx",
                    n_knn=16)
                grid("strideM16-2/approx p96/r64 knn16", gp, qcut)

        # ---- 3: rowmajor qloc on the best-known plain + knn configs ----
        for nk in knn_opts:
            gp = dataclasses.replace(
                base_gp, pool=96, rescore=64, qloc_mode="rowmajor",
                n_knn=nk)
            grid(f"ROWMAJ hierM16 p96/r64 knn{nk}", gp, 13 if nk == 0
                 else 11)

        # ---- 4: stage budget at the plain M16 winner ----
        for stage in ("qloc", "expand", "kernel", "regroup", "pool",
                      "prerank", "full"):
            gp = dataclasses.replace(
                base_gp, pool=96, rescore=64,
                stop_after="" if stage == "full" else stage)
            try:
                dt, _ = run(gp, 13, reps=3, with_recall=False)
                log(f"  budget B={B} W{W} hierM16 p96/r64 "
                    f"{stage:7s}: {dt*1e3:6.2f} ms")
            except Exception as e:  # noqa: BLE001
                log(f"  stage {stage}: FAILED {type(e).__name__}: {e}")

        del index
        import gc as _gc

        _gc.collect()

    out_path = os.path.join(ROOT, ".bench_cache", "probe_r4d.json")
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    log(f"wrote {out_path} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
