"""Round-3 probe H, one TPU session: HASHED tiles at 1M docs — the
recall-ceiling experiment (VERDICT r2 item 2: >=0.97 at 1M at >=20K QPS;
truncated V=1024 tops out ~0.954, SCALE_BENCH.json).

  1. upload hashed 1M index (V=1024, csub=2)
  2. qc x (pool, rescore) grid at B=2048 with recall vs cached GT
  3. kNN-refined rungs (knn16 graph reused from the truncated build —
     graph edges are doc ids; tiles don't enter refinement)

Usage: python -m seismic_tpu.harness.probe_r3h [hash_dir]
"""
from __future__ import annotations

import dataclasses
import faulthandler
import os
import sys
import time

import numpy as np

faulthandler.dump_traceback_later(3000, exit=True)
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)


def main():
    os.environ.setdefault("BENCH_N_DOCS", "1000000")
    os.environ.setdefault("BENCH_N_QUERIES", "2048")
    os.environ.setdefault("BENCH_BATCH", "2048")
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
    from seismic_tpu.types import IndexArrays, KNN_SUFFIX

    hash_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        bench.CACHE, "index_1000000_30522_400_v1024_o0_hash1024.dir"
    )
    V = 1024
    log("devices:", jax.devices())
    ds = bench.get_dataset()
    q_comps, q_vals = bench.get_queries(bench.DIM)
    gt_ids = bench.get_ground_truth(ds, q_comps, q_vals)
    del ds
    t0 = time.time()
    ha = IndexArrays.load_dir(hash_dir)
    log(f"hashed 1M index mmap-loaded: {time.time()-t0:.1f}s")
    for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
              "summary_codes", "dense_summary", "dense_scale",
              "block_sketch", "block_sketch_scale", "doc_sketch",
              "doc_sketch_scale"):
        setattr(ha, f, None)
    from seismic_tpu.search import knn as knn_mod

    knn_path = os.path.join(
        bench.CACHE, "index_1000000_30522_400_v1024_o0.knn16"
    )
    knn = None
    if os.path.exists(knn_path + KNN_SUFFIX):
        ha.knn = knn_mod.load_knn(knn_path)
        log(f"knn graph loaded: {ha.knn.shape}")
    t0 = time.time()
    index = ha.to_device(pallas_tiles=True, tile_csub=bench.CSUB,
                         tile_hash=V)
    ctx = PlannerContext.from_arrays(ha, csub=bench.CSUB)
    _sync(index.doc_tiles_aligned)
    log(f"to_device(hash 1M)+ctx: {time.time()-t0:.1f}s")

    B = 2048

    def run(gp, qcut, reps=8, with_recall=True):
        qn, vn = q_comps[:B], q_vals[:B]
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
            rec = recall_at_k(np.asarray(out[1]), gt_ids[:B])
        return dt, rec

    base = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                         compute_dtype="i8", pool_mode="hier",
                         pool_per_pair=16, kernel_unroll=8)
    for qcut in (10, 12, 14, 16):
        for pool, resc, ppp in ((64, 48, 16), (128, 96, 16),
                                (256, 128, 32)):
            gp = dataclasses.replace(base, pool=pool, rescore=resc,
                                     pool_per_pair=ppp)
            try:
                dt, rec = run(gp, qcut)
                log(f"e2e 1M hash hier U8 qc{qcut} p{pool}/r{resc}"
                    f"/t{ppp}: {dt*1e3:7.2f} ms  recall@10={rec:.4f} "
                    f"QPS={B/dt:,.0f}")
            except Exception as e:  # noqa: BLE001
                log(f"qc{qcut}/p{pool}: FAILED {type(e).__name__}: {e}")

    if index.knn is not None:
        for qcut, nk in ((12, 8), (14, 8), (14, 16)):
            gp = dataclasses.replace(base, pool=128, rescore=96,
                                     n_knn=nk)
            try:
                dt, rec = run(gp, qcut)
                log(f"e2e 1M hash knn{nk} qc{qcut} p128/r96: "
                    f"{dt*1e3:7.2f} ms  recall@10={rec:.4f} "
                    f"QPS={B/dt:,.0f}")
            except Exception as e:  # noqa: BLE001
                log(f"knn qc{qcut}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
