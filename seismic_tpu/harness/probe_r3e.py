"""Round-3 probe E, one TPU session: residue-bucketed qloc x kernel
unroll, on the residue-permuted index upload.

  1. e2e + recall at B=4096: hier16 {U1, U8} x residue qloc
  2. stage deltas for hier16 U8 residue
  3. B=8192 / B=16384 e2e

Usage: python -m seismic_tpu.harness.probe_r3e [U]
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

    U_best = int(sys.argv[1]) if len(sys.argv) > 1 else 8
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
    index = arrays.to_device(pallas_tiles=True, tile_csub=bench.CSUB,
                             vocab_residue=8)
    ctx = PlannerContext.from_arrays(arrays, csub=bench.CSUB)
    _sync(index.doc_tiles_aligned)
    log(f"to_device(residue)+ctx: {time.time()-t0:.1f}s "
        f"residue={index.vocab_residue}")

    QCUT = 11
    qc_np, qv_np = q_comps[: bench.BATCH], q_vals[: bench.BATCH]

    def queries_for(B):
        if B <= len(qc_np):
            return qc_np[:B], qv_np[:B]
        from seismic_tpu.harness.synth import synth_queries
        from seismic_tpu.search.engine import pad_queries

        parts = [(qc_np, qv_np)]
        need = B - len(qc_np)
        s = 0
        while need > 0:
            c1, v1 = synth_queries(1024, dim=bench.DIM, seed=300 + s)
            parts.append(pad_queries(c1, v1, qc_np.shape[1]))
            need -= 1024
            s += 1
        qc = np.concatenate([p[0] for p in parts])[:B]
        qv = np.concatenate([p[1] for p in parts])[:B]
        return qc, qv

    def run(gp, B, reps=10, with_recall=True):
        qc, qv = queries_for(B)
        caps = plan_caps(qc, qv, ctx, QCUT, M=8)
        qc_d = jnp.asarray(qc, jnp.int32)
        qv_d = jnp.asarray(qv, jnp.float32)
        out = search_grouped_derive_jit(
            index, qc_d, qv_d, gp, QCUT, 8, caps[0], caps[1],
            ctx.zero_region)
        _sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = search_grouped_derive_jit(
                index, qc_d, qv_d, gp, QCUT, 8, caps[0], caps[1],
                ctx.zero_region)
        _sync(out)
        dt = (time.time() - t0) / reps
        rec = -1.0
        if with_recall:
            ids = np.asarray(out[1])
            g_ref = gt_ids[: min(B, len(gt_ids))]
            rec = recall_at_k(ids[: len(g_ref)], g_ref)
        return dt, rec

    base = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                         compute_dtype="i8", pool_mode="hier",
                         pool_per_pair=16)
    # ---- 1. residue e2e at B=4096 ----
    for U in (1, U_best):
        gp = dataclasses.replace(base, kernel_unroll=U)
        try:
            dt, rec = run(gp, 4096)
            log(f"e2e B=4096 hier16 res16 U{U}: {dt*1e3:7.2f} ms  "
                f"recall@10={rec:.4f} QPS={4096/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"e2e res16 U{U}: FAILED {type(e).__name__}: {e}")

    # scb sensitivity
    for scb in (12, 24):
        gp = dataclasses.replace(base, kernel_unroll=U_best,
                                 residue_scb=scb)
        try:
            dt, rec = run(gp, 4096, reps=6)
            log(f"e2e B=4096 hier16 res{scb} U{U_best}: {dt*1e3:7.2f} ms "
                f"recall@10={rec:.4f} QPS={4096/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"e2e res{scb}: FAILED {type(e).__name__}: {e}")

    # ---- 2. stage deltas at B=4096 and B=8192 ----
    gp_ch = dataclasses.replace(base, kernel_unroll=U_best)
    for Bs in (4096, 8192):
        prev = 0.0
        for stg in ["qloc", "expand", "kernel", "regroup", "pool",
                    "prerank", ""]:
            gps = dataclasses.replace(gp_ch, stop_after=stg)
            try:
                dt, _ = run(gps, Bs, reps=5, with_recall=False)
                log(f"  B={Bs} res16 U{U_best} {stg or 'full':8s}: "
                    f"+{dt*1e3-prev:6.2f} ms (cum {dt*1e3:.2f})")
                prev = dt * 1e3
            except Exception as e:  # noqa: BLE001
                log(f"  B={Bs} res16 U{U_best} {stg or 'full'}: "
                    f"FAILED {e}")

    # ---- 3. big-batch e2e ----
    for B in (8192, 16384):
        for U in (1, U_best):
            gp = dataclasses.replace(base, kernel_unroll=U)
            try:
                dt, rec = run(gp, B, reps=6)
                log(f"e2e B={B} hier16 res16 U{U}: {dt*1e3:7.2f} ms  "
                    f"recall@10(first4096)={rec:.4f} QPS={B/dt:,.0f}")
            except Exception as e:  # noqa: BLE001
                log(f"e2e B={B} U{U}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
