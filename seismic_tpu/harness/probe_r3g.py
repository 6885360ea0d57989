"""Round-3 probe G, one TPU session: HASHED doc tiles on the 100K bench
index (ops/pallas_tiles.py::hash_retile) vs the truncated-vocab numbers
(probe_r3d: hier16 U8 = 91.8K QPS at recall 0.9725, qc=11).

  1. e2e derive-path hier16 U8 at B=4096: qc x rescore grid
  2. stage budget (stop_after) at the best point
  3. large-batch B=16384 rung
  4. V=512 hashed retile (on the fly): the round-2 V=512 negative was
     for TRUNCATED tiles (vocab loss); hashed tiles lose nothing, so
     halving V halves the kernel's bytes/FLOPs (~14 ms -> ~7 ms of the
     45 ms batch) if the extra collisions stay inside what the exact
     rescore absorbs.

Usage: python -m seismic_tpu.harness.probe_r3g [hash_dir]
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

    hash_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        bench.CACHE, "index_100000_30522_200_v1024_o64_hash1024.dir"
    )
    V = 1024
    log("devices:", jax.devices())
    ds = bench.get_dataset()
    q_comps, q_vals = bench.get_queries(bench.DIM)
    gt_ids = bench.get_ground_truth(ds, q_comps, q_vals)
    t0 = time.time()
    ha = IndexArrays.load_dir(hash_dir)
    log(f"hashed index mmap-loaded: {time.time()-t0:.1f}s")
    for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
              "summary_codes", "dense_summary", "dense_scale",
              "block_sketch", "block_sketch_scale", "doc_sketch",
              "doc_sketch_scale"):
        setattr(ha, f, None)
    t0 = time.time()
    index = ha.to_device(pallas_tiles=True, tile_csub=bench.CSUB,
                         tile_hash=V)
    ctx = PlannerContext.from_arrays(ha, csub=bench.CSUB)
    _sync(index.doc_tiles_aligned)
    log(f"to_device(hash)+ctx: {time.time()-t0:.1f}s")

    B = 4096
    qc_np, qv_np = q_comps[:B], q_vals[:B]
    qcd = jnp.asarray(qc_np, jnp.int32)
    qvd = jnp.asarray(qv_np, jnp.float32)

    def run(gp, qcut, B_, reps=10, with_recall=True):
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

    base = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                         compute_dtype="i8", pool_mode="hier",
                         pool_per_pair=16, kernel_unroll=8)
    # ---- qc x rescore grid at B=4096 ----
    for qcut in (10, 11, 12, 14):
        for resc, pool in ((48, 64), (96, 128)):
            gp = dataclasses.replace(base, rescore=resc, pool=pool)
            try:
                dt, rec = run(gp, qcut, B, reps=8)
                log(f"e2e B=4096 hash{V} hier16 U8 qc{qcut} "
                    f"pool{pool}/r{resc}: {dt*1e3:7.2f} ms  "
                    f"recall@10={rec:.4f} QPS={B/dt:,.0f}")
            except Exception as e:  # noqa: BLE001
                log(f"qc{qcut}/r{resc}: FAILED {type(e).__name__}: {e}")

    # ---- stride pool points (pool was measured only NEUTRAL vs hier in
    # r3e when the qloc chain dominated; with hash tiles qloc ~vanishes,
    # so the stride pool's 8x smaller pool input may now win) ----
    for qcut in (11, 12):
        for resc, pool in ((48, 64), (96, 128)):
            gp = dataclasses.replace(base, pool_mode="stride",
                                     rescore=resc, pool=pool)
            try:
                dt, rec = run(gp, qcut, B, reps=8)
                log(f"e2e B=4096 hash{V} STRIDE U8 qc{qcut} "
                    f"pool{pool}/r{resc}: {dt*1e3:7.2f} ms  "
                    f"recall@10={rec:.4f} QPS={B/dt:,.0f}")
            except Exception as e:  # noqa: BLE001
                log(f"stride qc{qcut}/r{resc}: FAILED "
                    f"{type(e).__name__}: {e}")

    # ---- stage budget at qc=11 ----
    for stage in ("qloc", "expand", "kernel", "regroup", "pool",
                  "prerank", "full"):
        gp = dataclasses.replace(
            base, stop_after=None if stage == "full" else stage)
        try:
            dt, _ = run(gp, 11, B, reps=6, with_recall=False)
            log(f"  B=4096 hash U8 {stage:7s}: {dt*1e3:6.2f} ms")
        except Exception as e:  # noqa: BLE001
            log(f"  stage {stage}: FAILED {type(e).__name__}: {e}")

    # ---- large batch ----
    for B_ in (8192, 16384):
        try:
            dt, rec = run(base, 11, B_, reps=6)
            log(f"e2e B={B_} hash hier16 U8 qc11: {dt*1e3:7.2f} ms  "
                f"recall@10={rec:.4f} QPS={B_/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"B={B_}: FAILED {type(e).__name__}: {e}")

    # ---- V=512 hashed retile: half the kernel bytes ----
    from seismic_tpu.ops.pallas_tiles import hash_retile

    del index
    V2 = 512
    h2dir = os.path.join(
        bench.CACHE, f"index_100000_30522_200_v1024_o64_hash{V2}.dir"
    )
    t0 = time.time()
    if os.path.isdir(h2dir):
        h2 = IndexArrays.load_dir(h2dir)
        log(f"hashed V={V2} index loaded: {time.time()-t0:.1f}s")
    else:
        base_arrays = IndexArrays.load_dir(os.path.join(
            bench.CACHE, "index_100000_30522_200_v1024_o64.dir"))
        h2 = hash_retile(base_arrays, V2)
        log(f"hash_retile V={V2}: {time.time()-t0:.1f}s")
        h2.save_dir(h2dir)
        del base_arrays
    for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
              "summary_codes", "dense_summary", "dense_scale",
              "block_sketch", "block_sketch_scale", "doc_sketch",
              "doc_sketch_scale"):
        setattr(h2, f, None)
    t0 = time.time()
    index = h2.to_device(pallas_tiles=True, tile_csub=bench.CSUB,
                         tile_hash=V2)
    ctx = PlannerContext.from_arrays(h2, csub=bench.CSUB)
    _sync(index.doc_tiles_aligned)
    log(f"to_device(hash {V2})+ctx: {time.time()-t0:.1f}s")
    for qcut in (11, 12, 14):
        for resc, pool in ((48, 64), (96, 128)):
            gp = dataclasses.replace(base, rescore=resc, pool=pool)
            try:
                dt, rec = run(gp, qcut, B, reps=8)
                log(f"e2e B=4096 hash{V2} hier16 U8 qc{qcut} "
                    f"pool{pool}/r{resc}: {dt*1e3:7.2f} ms  "
                    f"recall@10={rec:.4f} QPS={B/dt:,.0f}")
            except Exception as e:  # noqa: BLE001
                log(f"V{V2} qc{qcut}/r{resc}: FAILED "
                    f"{type(e).__name__}: {e}")
    for B_ in (8192, 16384):
        try:
            dt, rec = run(base, 11, B_, reps=6)
            log(f"e2e B={B_} hash{V2} hier16 U8 qc11: {dt*1e3:7.2f} ms "
                f"recall@10={rec:.4f} QPS={B_/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"V{V2} B={B_}: FAILED {type(e).__name__}: {e}")

    # ---- stride pool at V=512 (smallest kernel + smallest pool) ----
    for qcut in (11, 12):
        for resc, pool in ((48, 64), (96, 128)):
            gp = dataclasses.replace(base, pool_mode="stride",
                                     rescore=resc, pool=pool)
            try:
                dt, rec = run(gp, qcut, B, reps=8)
                log(f"e2e B=4096 hash{V2} STRIDE U8 qc{qcut} "
                    f"pool{pool}/r{resc}: {dt*1e3:7.2f} ms  "
                    f"recall@10={rec:.4f} QPS={B/dt:,.0f}")
            except Exception as e:  # noqa: BLE001
                log(f"V{V2} stride qc{qcut}: FAILED "
                    f"{type(e).__name__}: {e}")
    for B_ in (16384,):
        gp = dataclasses.replace(base, pool_mode="stride")
        try:
            dt, rec = run(gp, 11, B_, reps=6)
            log(f"e2e B={B_} hash{V2} STRIDE U8 qc11: {dt*1e3:7.2f} ms "
                f"recall@10={rec:.4f} QPS={B_/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"V{V2} stride B={B_}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
