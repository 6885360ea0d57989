"""Round-3 probe I, one TPU session: BLOCK-summary pooling at 100K —
the fast-AND-lean experiment (VERDICT r2 item 3: recall >=0.97 at <=2x
forward-index bytes AND >=5x the 5.4K-QPS CPU baseline).

Device state: forward (fused) + postings + block geometry + hashed
[n_blocks, V] block tiles — no per-posting tile replication. The grouped
scorer runs UNCHANGED over block rows; the tail expands pooled blocks
into member postings and exact-rescores all of them
(GroupedParams.block_expand).

  1. block_pool_arrays view of the cached 100K index (V x {512, 1024})
  2. qc x (pool, expand) grid at B=4096 with recall vs cached GT
  3. device HBM bytes per configuration

Usage: python -m seismic_tpu.harness.probe_r3i
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
    os.environ.setdefault("BENCH_N_QUERIES", "4096")
    import bench
    from bench import _sync, log, recall_at_k

    import jax
    import jax.numpy as jnp

    from seismic_tpu.ops.pallas_tiles import block_pool_arrays
    from seismic_tpu.search.grouped import (
        GroupedParams,
        plan_caps,
        search_grouped_derive_jit,
    )
    from seismic_tpu.search.planner import PlannerContext

    log("devices:", jax.devices())
    ds = bench.get_dataset()
    arrays, _ = bench.get_index(ds)
    q_comps, q_vals = bench.get_queries(bench.DIM)
    gt_ids = bench.get_ground_truth(ds, q_comps, q_vals)
    del ds
    B = 4096

    for V in (512, 1024):
        t0 = time.time()
        bv = block_pool_arrays(arrays, V)
        for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
                  "summary_codes", "dense_summary", "dense_scale",
                  "block_sketch", "block_sketch_scale", "doc_sketch",
                  "doc_sketch_scale"):
            setattr(bv, f, None)
        log(f"block view V={V}: {time.time()-t0:.1f}s "
            f"rows={bv.doc_tiles.shape[0]:,}")
        t0 = time.time()
        index = bv.to_device(pallas_tiles=True, tile_csub=bench.CSUB,
                             tile_hash=V)
        ctx = PlannerContext.from_arrays(bv, csub=bench.CSUB)
        _sync(index.doc_tiles_aligned)
        dev_b = int(sum(x.nbytes for x in jax.tree.leaves(index)
                        if hasattr(x, "nbytes")))
        fwd_b = int(index.fwd_fused.nbytes
                    if index.fwd_fused is not None
                    else index.fwd_comps.nbytes + index.fwd_vals.nbytes)
        log(f"to_device(block V={V})+ctx: {time.time()-t0:.1f}s "
            f"device={dev_b/1e9:.2f}GB fwd={fwd_b/1e9:.2f}GB "
            f"ratio={dev_b/max(fwd_b,1):.2f}x")

        def run(gp, qcut, reps=8):
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
            return dt, recall_at_k(np.asarray(out[1]), gt_ids[:B])

        E = int(arrays.max_block_len)
        base = GroupedParams(k=10, score_cut=64, pool=32, block_expand=E,
                             compute_dtype="i8", pool_mode="hier",
                             pool_per_pair=8, kernel_unroll=8)
        for qcut in (10, 12, 14):
            for pool, ppp in ((16, 4), (32, 8), (48, 12), (64, 16)):
                gp = dataclasses.replace(base, pool=pool,
                                         pool_per_pair=ppp)
                try:
                    dt, rec = run(gp, qcut)
                    log(f"e2e 100K block V{V} qc{qcut} p{pool}xE{E}: "
                        f"{dt*1e3:7.2f} ms  recall@10={rec:.4f} "
                        f"QPS={B/dt:,.0f}")
                except Exception as e:  # noqa: BLE001
                    log(f"V{V}/qc{qcut}/p{pool}: FAILED "
                        f"{type(e).__name__}: {e}")
        del index, ctx


if __name__ == "__main__":
    main()
