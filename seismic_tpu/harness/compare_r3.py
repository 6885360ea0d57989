"""Round-3 A/B of the tail-cut pool modes at the bench operating point.

One TPU session (one index upload): e2e time + recall at (B=4096, qc=11,
i8, rescore=48) for pool_mode hier (round-2 config, now with the int16
gather twins) vs slot vs window, plus stop_after deltas for the winner.

Usage: python -m seismic_tpu.harness.compare_r3
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

    log("devices:", jax.devices())
    ds = bench.get_dataset()
    arrays, _ = bench.get_index(ds)
    q_comps, q_vals = bench.get_queries(bench.DIM)
    gt_ids = bench.get_ground_truth(ds, q_comps, q_vals)
    for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
              "summary_codes", "dense_summary", "dense_scale",
              "block_sketch", "block_sketch_scale", "doc_sketch",
              "doc_sketch_scale"):
        setattr(arrays, f, None)
    t0 = time.time()
    index = arrays.to_device(pallas_tiles=True, tile_csub=bench.CSUB)
    ctx = PlannerContext.from_arrays(arrays, csub=bench.CSUB)
    _sync(index.doc_tiles_aligned)
    log(f"to_device+ctx: {time.time()-t0:.1f}s  "
        f"vocab16={index.vocab16 is not None} "
        f"fwd16={index.fwd_comps16 is not None}")

    B, QCUT = bench.BATCH, 11
    qc_np, qv_np = q_comps[:B], q_vals[:B]
    qc_dev = jnp.asarray(qc_np, jnp.int32)
    qv_dev = jnp.asarray(qv_np, jnp.float32)
    gc, wc = plan_caps(qc_np, qv_np, ctx, QCUT, M=8)

    def run(gp, reps=10):
        out = search_grouped_derive_jit(
            index, qc_dev, qv_dev, gp, QCUT, 8, gc, wc, ctx.zero_region)
        _sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = search_grouped_derive_jit(
                index, qc_dev, qv_dev, gp, QCUT, 8, gc, wc,
                ctx.zero_region)
        _sync(out)
        dt = (time.time() - t0) / reps
        rec = recall_at_k(np.asarray(out[1]), gt_ids[:B])
        return dt, rec

    base = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                         compute_dtype="i8")
    configs = [
        ("hier16 (r2 cfg)", dataclasses.replace(
            base, pool_mode="hier", pool_per_pair=16)),
        ("slot12", dataclasses.replace(
            base, pool_mode="slot", pool_per_pair=12)),
        ("slot16", dataclasses.replace(
            base, pool_mode="slot", pool_per_pair=16)),
        ("window8", dataclasses.replace(
            base, pool_mode="window", pool_window=8)),
        ("window16", dataclasses.replace(
            base, pool_mode="window", pool_window=16)),
        ("approx (r1)", dataclasses.replace(base, pool_mode="approx")),
    ]
    results = {}
    for name, gp in configs:
        try:
            dt, rec = run(gp)
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        qps = B / dt
        results[name] = (dt, rec, qps)
        log(f"{name:16s}: {dt*1e3:7.2f} ms  recall@10={rec:.4f} "
            f"QPS={qps:,.0f}")

    # stop_after deltas for the two fastest
    order = sorted(results, key=lambda n: results[n][0])[:2]
    for name in order:
        gp = dict(configs)[name]
        log(f"--- stop_after deltas: {name} ---")
        prev = 0.0
        for st in ["qloc", "expand", "kernel", "regroup", "pool",
                   "prerank", ""]:
            gps = dataclasses.replace(gp, stop_after=st)
            try:
                dt, _ = run(gps, reps=5)
            except Exception as e:  # noqa: BLE001
                log(f"  {st or 'full':8s}: FAILED {e}")
                continue
            log(f"  {st or 'full':8s}: +{dt*1e3-prev:7.2f} ms "
                f"(cum {dt*1e3:.2f})")
            prev = dt * 1e3


if __name__ == "__main__":
    main()
