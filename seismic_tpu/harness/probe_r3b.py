"""Round-3 optimization probes, one TPU session:

  1. e2e + recall: hier16 (champion) vs stride pool (r=8, r=4)
  2. qloc kernel: f32-acc vs all-int16 variant (VPU 16-bit packing)
  3. grouped kernel: csub 2 vs 4, and "parallel" dimension semantics
  4. rescore with f16-converted forward values
  5. host planner stats at B = 4096 / 8192 / 16384 (list-DMA sharing)

Usage: python -m seismic_tpu.harness.probe_r3b
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
    from seismic_tpu.search.planner import PlannerContext, plan_grouped

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

    # ---- 5. host planner stats first (no device needed) ----
    ctx_host = PlannerContext.from_arrays(arrays, csub=bench.CSUB)
    for B_probe in (4096, 8192, 16384):
        reps = max(1, B_probe // 4096)
        qc_big = np.concatenate([q_comps] * reps)[:B_probe]
        qv_big = np.concatenate([q_vals] * reps)[:B_probe]
        if reps > 1:
            # fresh seeds so duplicate queries don't fake sharing
            from seismic_tpu.harness.synth import synth_queries
            from seismic_tpu.search.engine import pad_queries
            parts = []
            for s in range(B_probe // 1024):
                c1, v1 = synth_queries(1024, dim=bench.DIM, seed=100 + s)
                parts.append(pad_queries(c1, v1, 64))
            qc_big = np.concatenate([p[0] for p in parts])
            qv_big = np.concatenate([p[1] for p in parts])
        t0 = time.time()
        plan = plan_grouped(qc_big, qv_big, ctx_host, 11, M=8)
        dt = time.time() - t0
        log(f"plan B={B_probe}: G={plan.G} W={plan.W} "
            f"W/query={plan.W/B_probe:.2f} plan_time={dt*1e3:.0f}ms")

    t0 = time.time()
    index = arrays.to_device(pallas_tiles=True, tile_csub=bench.CSUB)
    ctx = PlannerContext.from_arrays(arrays, csub=bench.CSUB)
    _sync(index.doc_tiles_aligned)
    log(f"to_device+ctx: {time.time()-t0:.1f}s")

    B, QCUT = bench.BATCH, 11
    qc_np, qv_np = q_comps[:B], q_vals[:B]
    qc_dev = jnp.asarray(qc_np, jnp.int32)
    qv_dev = jnp.asarray(qv_np, jnp.float32)
    gc, wc = plan_caps(qc_np, qv_np, ctx, QCUT, M=8)

    def run(gp, reps=10, with_recall=True):
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
        rec = (recall_at_k(np.asarray(out[1]), gt_ids[:B])
               if with_recall else -1)
        return dt, rec

    # ---- 1. e2e stride pool vs hier ----
    base = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                         compute_dtype="i8")
    for name, gp in [
        ("hier16", dataclasses.replace(base, pool_mode="hier",
                                       pool_per_pair=16)),
        ("stride8", dataclasses.replace(base, pool_mode="stride",
                                        pool_stride=8)),
        ("stride4", dataclasses.replace(base, pool_mode="stride",
                                        pool_stride=4)),
        ("stride8 pool128", dataclasses.replace(
            base, pool_mode="stride", pool_stride=8, pool=128, rescore=64)),
    ]:
        try:
            dt, rec = run(gp)
            log(f"e2e {name:18s}: {dt*1e3:7.2f} ms  recall@10={rec:.4f} "
                f"QPS={B/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"e2e {name}: FAILED {type(e).__name__}: {e}")

    # stage deltas for stride8
    gp8 = dataclasses.replace(base, pool_mode="stride", pool_stride=8)
    prev = 0.0
    for st in ["qloc", "expand", "kernel", "regroup", "pool", "prerank",
               ""]:
        gps = dataclasses.replace(gp8, stop_after=st)
        try:
            dt, _ = run(gps, reps=5, with_recall=False)
            log(f"  stride8 {st or 'full':8s}: +{dt*1e3-prev:6.2f} ms "
                f"(cum {dt*1e3:.2f})")
            prev = dt * 1e3
        except Exception as e:  # noqa: BLE001
            log(f"  stride8 {st or 'full'}: FAILED {e}")

    # ---- 2. qloc kernel (i16 variant probed + removed: Mosaic on this
    # device rejects 16-bit vector compares) ----
    from seismic_tpu.ops.pallas_qloc import project_qloc_pallas

    rng = np.random.default_rng(0)
    V, P_cap, SCP, sc = 1024, 45056, 64, 64
    vocab16 = jnp.asarray(
        rng.integers(0, 30000, size=(V, P_cap)), jnp.int16)
    qc16 = jnp.asarray(rng.integers(0, 30000, size=(SCP, P_cap)), jnp.int16)
    qv16 = jnp.asarray(rng.integers(0, 127, size=(SCP, P_cap)), jnp.int16)
    qvf = qv16.astype(jnp.float32)
    _sync((vocab16, qc16, qv16, qvf))

    def t_of(fn, *a, reps=5):
        out = _sync(fn(*a))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a)
        _sync(out)
        return (time.time() - t0) / reps

    f32_fn = jax.jit(lambda v, c, x: project_qloc_pallas(v, c, x, sc))
    try:
        t = t_of(f32_fn, vocab16, qc16.astype(jnp.int32), qvf)
        log(f"qloc f32-acc  [V={V}, P={P_cap}] sc={sc}: {t*1e3:7.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"qloc f32: FAILED {e}")

    # ---- 4. rescore with f16 values ----
    from seismic_tpu.build.convert import convert_index
    from seismic_tpu.ops.pallas_rescore import rescore_exact

    ids_np = rng.integers(0, index.n_docs, size=(B, 48), dtype=np.int64)
    ids_dev = jnp.asarray(ids_np, jnp.int32)
    top_v, top_p = jax.lax.top_k(jnp.where(
        qc_dev != np.int32(2**31 - 1), qv_dev, 0.0), 64)
    top_c = jnp.take_along_axis(qc_dev, top_p, axis=1)
    top_c, top_v = _sync((top_c, top_v))

    @jax.jit
    def f_rescore32(ids, tc, tv):
        return rescore_exact(index, ids, tc, tv, 64)

    t = t_of(f_rescore32, ids_dev, top_c, top_v)
    log(f"rescore f32 vals [B,48] sc=64:  {t*1e3:7.2f} ms")

    # swap ONLY the forward values for the f16 twin (a second full index
    # upload would double HBM); the rescore gather reads f16 rows and
    # widens in XLA via _decode_fwd_vals
    arr16 = convert_index(arrays, "f16")
    idx16 = dataclasses.replace(
        index, fwd_vals=jax.device_put(jnp.asarray(arr16.fwd_vals))
    )
    _sync(idx16.fwd_vals)

    @jax.jit
    def f_rescore16(ids, tc, tv):
        return rescore_exact(idx16, ids, tc, tv, 64)

    try:
        t = t_of(f_rescore16, ids_dev, top_c, top_v)
        log(f"rescore f16 vals [B,48] sc=64:  {t*1e3:7.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"rescore f16: FAILED {e}")


if __name__ == "__main__":
    main()
