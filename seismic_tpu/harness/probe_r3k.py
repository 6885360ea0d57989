"""Round-3 probe K, one TPU session: BLOCK-SUMMARY pooling at 1M docs.

Three-way 1M comparison (VERDICT r2 items 2/3/4):
  - round-2 truncated doc tiles: 28-37K QPS at recall 0.950-0.956,
    11.2 GB device (SCALE_BENCH.json)
  - hashed doc tiles (probe_r3h): same tile bytes, no vocab truncation
  - THIS probe: hashed [n_blocks, V] block tiles — the grouped kernel
    streams ~672K block rows instead of 7.6M posting rows (11x less MXU
    work), the pool emits block ids, and `block_expand` exact-rescores
    each pooled block's <=32 members. Device state is forward + postings
    + block geometry + 0.34 GB block tiles (~2 GB total vs 11.2 GB) —
    the reference's summary-gate + evaluate_posting_block economics
    (reference posting_list.rs:115-215) at block granularity.

Stages: block view (V argv, default 512) -> lean upload -> qc x pool
ladder at B=2048 -> kNN-refined rungs (cached knn16 graph).

Usage: python -m seismic_tpu.harness.probe_r3k [V]
"""
from __future__ import annotations

import dataclasses
import faulthandler
import os
import sys
import time

import numpy as np

faulthandler.dump_traceback_later(4800, exit=True)
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)

V = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def main():
    os.environ.setdefault("BENCH_N_DOCS", "1000000")
    os.environ.setdefault("BENCH_N_QUERIES", "2048")
    os.environ.setdefault("BENCH_BATCH", "2048")
    import bench
    from bench import _sync, log, recall_at_k

    import jax
    import jax.numpy as jnp

    from seismic_tpu.ops.pallas_tiles import block_pool_arrays
    from seismic_tpu.search import knn as knn_mod
    from seismic_tpu.search.grouped import (
        GroupedParams,
        plan_caps,
        search_grouped_derive_jit,
    )
    from seismic_tpu.search.planner import PlannerContext
    from seismic_tpu.types import KNN_SUFFIX, IndexArrays

    log("devices:", jax.devices())
    ds = bench.get_dataset()
    q_comps, q_vals = bench.get_queries(bench.DIM)
    gt_ids = bench.get_ground_truth(ds, q_comps, q_vals)
    del ds

    base = os.path.join(bench.CACHE, "index_1000000_30522_400_v1024_o0")
    t0 = time.time()
    arrays = IndexArrays.load_dir(base + ".dir")
    log(f"1M index mmap-loaded: {time.time()-t0:.1f}s")
    t0 = time.time()
    tile_hash = 0
    if arrays.dense_summary is not None:
        # DENSE block tiles (probe_r3p: exact-summary pool quality; the
        # hashed rows lose 3-7 points of block-pool recall)
        if V < arrays.dense_summary.shape[1]:
            from seismic_tpu.ops.pallas_tiles import narrow_vocab

            arrays = narrow_vocab(arrays, V)
        bv = block_pool_arrays(arrays, V, order_members=True, mode="dense")
    else:
        bv = block_pool_arrays(arrays, V, order_members=True, mode="hash")
        tile_hash = V
    log(f"block view V={V} (hash={bool(tile_hash)}): {time.time()-t0:.1f}s "
        f"rows={bv.doc_tiles.shape[0]:,}")
    for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
              "summary_codes", "dense_summary", "dense_scale",
              "block_sketch", "block_sketch_scale", "doc_sketch",
              "doc_sketch_scale"):
        setattr(bv, f, None)
    E = int(arrays.max_block_len)
    del arrays
    if os.path.exists(base + ".knn16" + KNN_SUFFIX):
        bv.knn = knn_mod.load_knn(base + ".knn16")
        log(f"knn graph loaded: {bv.knn.shape}")

    t0 = time.time()
    index = bv.to_device(pallas_tiles=True, tile_csub=2,
                         tile_hash=tile_hash, lean_fwd=True)
    ctx = PlannerContext.from_arrays(bv, csub=2)
    _sync(index.doc_tiles_aligned)
    dev_b = int(sum(x.nbytes for x in jax.tree.leaves(index)
                    if hasattr(x, "nbytes")))
    log(f"to_device(1M block V={V})+ctx: {time.time()-t0:.0f}s "
        f"device={dev_b/1e9:.2f}GB")

    B = 2048
    rows = []

    def flush_rows():
        import json

        path = os.path.join(ROOT, "SCALE_BENCH.json")
        art = {}
        if os.path.exists(path):
            with open(path) as f:
                art = json.load(f)
        art["rungs_r4_block_lean"] = {
            "note": (
                "round-4 probe_r3k: memory-lean block-summary pooling at "
                "1M docs (dense [n_blocks, V] block tiles + block_expand "
                "exact rescore, u8 lean forward), B=2048"
            ),
            "V": V,
            "device_bytes": dev_b,
            "rungs": rows,
        }
        with open(path, "w") as f:
            json.dump(art, f, indent=1)

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

    basep = GroupedParams(k=10, score_cut=64, pool=32, block_expand=E,
                          compute_dtype="i8", pool_mode="hier",
                          pool_per_pair=8, kernel_unroll=8)
    for qcut in (10, 12, 14, 16):
        for pool, ppp in ((64, 16), (96, 24), (128, 32)):
            gp = dataclasses.replace(basep, pool=pool, pool_per_pair=ppp)
            try:
                dt, rec = run(gp, qcut)
                log(f"e2e 1M block V{V} qc{qcut} p{pool}xE{E}: "
                    f"{dt*1e3:8.2f} ms  recall@10={rec:.4f} "
                    f"QPS={B/dt:,.0f}")
                rows.append({
                    "query_cut": qcut, "pool": pool, "E": E,
                    "ms_per_batch": round(dt * 1e3, 2),
                    "qps": round(B / dt, 1),
                    "recall_at_10": round(rec, 4)})
                flush_rows()
            except Exception as e:  # noqa: BLE001
                log(f"qc{qcut}/p{pool}: FAILED {type(e).__name__}: {e}")

    if bv.knn is not None:
        for qcut, pool, ppp, nk in ((12, 64, 16, 8), (14, 64, 16, 8),
                                    (14, 96, 24, 16)):
            gp = dataclasses.replace(basep, pool=pool, pool_per_pair=ppp,
                                     n_knn=nk)
            try:
                dt, rec = run(gp, qcut)
                log(f"e2e 1M block knn{nk} qc{qcut} p{pool}: "
                    f"{dt*1e3:8.2f} ms  recall@10={rec:.4f} "
                    f"QPS={B/dt:,.0f}")
                rows.append({
                    "query_cut": qcut, "pool": pool, "E": E, "n_knn": nk,
                    "ms_per_batch": round(dt * 1e3, 2),
                    "qps": round(B / dt, 1),
                    "recall_at_10": round(rec, 4)})
                flush_rows()
            except Exception as e:  # noqa: BLE001
                log(f"knn qc{qcut}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
