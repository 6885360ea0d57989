"""Round-3 probe D, one TPU session: kernel U-way unroll (item-major).

  1. e2e + recall at B=4096: hier16 U in {1, 4, 8} (+ stride8apx U8)
  2. stage deltas for hier16 U8
  3. B=8192 and B=16384 e2e for the best U

Usage: python -m seismic_tpu.harness.probe_r3d
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
    log(f"to_device+ctx: {time.time()-t0:.1f}s")

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
    # ---- 1. U sweep at B=4096 ----
    best_u, best_dt = 1, 1e9
    for U in (1, 4, 8):
        gp = dataclasses.replace(base, kernel_unroll=U)
        try:
            dt, rec = run(gp, 4096)
            log(f"e2e B=4096 hier16 U{U}: {dt*1e3:7.2f} ms  "
                f"recall@10={rec:.4f} QPS={4096/dt:,.0f}")
            if dt < best_dt:
                best_u, best_dt = U, dt
        except Exception as e:  # noqa: BLE001
            log(f"e2e hier16 U{U}: FAILED {type(e).__name__}: {e}")
    st = dataclasses.replace(base, pool_mode="stride", pool_stride=8,
                             pool_select="approx", kernel_unroll=8)
    try:
        dt, rec = run(st, 4096)
        log(f"e2e B=4096 str8apx U8: {dt*1e3:7.2f} ms  "
            f"recall@10={rec:.4f} QPS={4096/dt:,.0f}")
    except Exception as e:  # noqa: BLE001
        log(f"e2e str8apx U8: FAILED {type(e).__name__}: {e}")

    # ---- 2. stage deltas for hier16 U{best} ----
    gp_ch = dataclasses.replace(base, kernel_unroll=best_u)
    prev = 0.0
    for stg in ["qloc", "expand", "kernel", "regroup", "pool", "prerank",
                ""]:
        gps = dataclasses.replace(gp_ch, stop_after=stg)
        try:
            dt, _ = run(gps, 4096, reps=5, with_recall=False)
            log(f"  hier16 U{best_u} {stg or 'full':8s}: "
                f"+{dt*1e3-prev:6.2f} ms (cum {dt*1e3:.2f})")
            prev = dt * 1e3
        except Exception as e:  # noqa: BLE001
            log(f"  hier16 U{best_u} {stg or 'full'}: FAILED {e}")

    # ---- 3. big-batch e2e ----
    for B in (8192, 16384):
        try:
            dt, rec = run(gp_ch, B, reps=6)
            log(f"e2e B={B} hier16 U{best_u}: {dt*1e3:7.2f} ms  "
                f"recall@10(first4096)={rec:.4f} QPS={B/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"e2e B={B} hier16 U{best_u}: FAILED "
                f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
