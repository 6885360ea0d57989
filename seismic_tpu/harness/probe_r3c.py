"""Round-3 probe C, one TPU session (after stride-v2 + fused tile):

  1. e2e + recall: hier16 (r2 champion, now w/ fused rescore) vs
     stride8 v2 (in-kernel lane max + regroup-first) x {exact, approx
     final pool} x {qloc_cut 0, 32}
  2. stage deltas for the best stride config
  3. rescore: fused single-gather vs split comps16+vals gathers
  4. B=8192 e2e for the champion (W/query drops ~24% -- plan stats)

Usage: python -m seismic_tpu.harness.probe_r3c
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
    log(f"to_device+ctx: {time.time()-t0:.1f}s "
        f"fused={index.fwd_fused is not None} "
        f"comps_dropped={index.fwd_comps is None}")

    B, QCUT = bench.BATCH, 11
    qc_np, qv_np = q_comps[:B], q_vals[:B]
    qc_dev = jnp.asarray(qc_np, jnp.int32)
    qv_dev = jnp.asarray(qv_np, jnp.float32)
    gc, wc = plan_caps(qc_np, qv_np, ctx, QCUT, M=8)

    def run(gp, reps=10, with_recall=True, qc_d=None, qv_d=None,
            caps=None, gt=None, nb=None):
        qc_d = qc_dev if qc_d is None else qc_d
        qv_d = qv_dev if qv_d is None else qv_d
        g, w = caps or (gc, wc)
        out = search_grouped_derive_jit(
            index, qc_d, qv_d, gp, QCUT, 8, g, w, ctx.zero_region)
        _sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = search_grouped_derive_jit(
                index, qc_d, qv_d, gp, QCUT, 8, g, w, ctx.zero_region)
        _sync(out)
        dt = (time.time() - t0) / reps
        rec = -1.0
        if with_recall:
            ids = np.asarray(out[1])
            g_ref = gt_ids[:B] if gt is None else gt
            rec = recall_at_k(ids[:len(g_ref)], g_ref)
        return dt, rec

    # ---- 1. e2e matrix ----
    base = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                         compute_dtype="i8")
    cfgs = [
        ("hier16        ", dataclasses.replace(
            base, pool_mode="hier", pool_per_pair=16)),
        ("hier16 qc32   ", dataclasses.replace(
            base, pool_mode="hier", pool_per_pair=16, qloc_cut=32)),
        ("stride8 exact ", dataclasses.replace(
            base, pool_mode="stride", pool_stride=8)),
        ("stride8 approx", dataclasses.replace(
            base, pool_mode="stride", pool_stride=8,
            pool_select="approx")),
        ("str8 apx qc32 ", dataclasses.replace(
            base, pool_mode="stride", pool_stride=8,
            pool_select="approx", qloc_cut=32)),
        ("str8 apx qc24 ", dataclasses.replace(
            base, pool_mode="stride", pool_stride=8,
            pool_select="approx", qloc_cut=24)),
    ]
    results = {}
    for name, gp in cfgs:
        try:
            dt, rec = run(gp)
            results[name] = (dt, rec)
            log(f"e2e {name}: {dt*1e3:7.2f} ms  recall@10={rec:.4f} "
                f"QPS={B/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"e2e {name}: FAILED {type(e).__name__}: {e}")

    # ---- 2. stage deltas for the champion stride config ----
    gp_ch = dataclasses.replace(base, pool_mode="stride", pool_stride=8,
                                pool_select="approx")
    prev = 0.0
    for st in ["qloc", "expand", "kernel", "regroup", "pool", "prerank",
               ""]:
        gps = dataclasses.replace(gp_ch, stop_after=st)
        try:
            dt, _ = run(gps, reps=5, with_recall=False)
            log(f"  stride8apx {st or 'full':8s}: +{dt*1e3-prev:6.2f} ms "
                f"(cum {dt*1e3:.2f})")
            prev = dt * 1e3
        except Exception as e:  # noqa: BLE001
            log(f"  stride8apx {st or 'full'}: FAILED {e}")

    # ---- 3. rescore fused vs split ----
    from seismic_tpu.data.sparse import PAD_COMPONENT
    from seismic_tpu.ops.pallas_rescore import rescore_exact

    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, index.n_docs, size=(B, 48), dtype=np.int64)
    ids_dev = jnp.asarray(ids_np, jnp.int32)
    top_v, top_p = jax.lax.top_k(jnp.where(
        qc_dev != np.int32(PAD_COMPONENT), qv_dev, 0.0), 64)
    top_c = jnp.take_along_axis(qc_dev, top_p, axis=1)
    top_c, top_v = _sync((top_c, top_v))

    def t_of(fn, *a, reps=10):
        out = _sync(fn(*a))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a)
        _sync(out)
        return (time.time() - t0) / reps

    @jax.jit
    def f_fused(ids, tc, tv):
        return rescore_exact(index, ids, tc, tv, 64)

    t = t_of(f_fused, ids_dev, top_c, top_v)
    log(f"rescore fused [B,48] sc=64:  {t*1e3:7.2f} ms")

    fc = np.asarray(arrays.fwd_comps)
    idx_split = dataclasses.replace(
        index,
        fwd_fused=None,
        fwd_comps16=jax.device_put(jnp.asarray(
            np.where(fc == PAD_COMPONENT, -1, fc).astype(np.int16))),
        fwd_vals=jax.device_put(jnp.asarray(
            np.asarray(arrays.fwd_vals, dtype=np.float32))),
    )
    _sync(idx_split.fwd_vals)

    @jax.jit
    def f_split(ids, tc, tv):
        return rescore_exact(idx_split, ids, tc, tv, 64)

    t = t_of(f_split, ids_dev, top_c, top_v)
    log(f"rescore split [B,48] sc=64:  {t*1e3:7.2f} ms")

    # ---- 4. B=8192 e2e for the champion ----
    from seismic_tpu.harness.synth import synth_queries
    from seismic_tpu.search.engine import pad_queries

    parts = [(qc_np, qv_np)]
    for s in range(4):
        c1, v1 = synth_queries(1024, dim=bench.DIM, seed=300 + s)
        parts.append(pad_queries(c1, v1, qc_np.shape[1]))
    qc8 = np.concatenate([p[0] for p in parts])[:8192]
    qv8 = np.concatenate([p[1] for p in parts])[:8192]
    caps8 = plan_caps(qc8, qv8, ctx, QCUT, M=8)
    log(f"caps B=8192: G_cap={caps8[0]} W_cap={caps8[1]} "
        f"(B=4096: {gc}/{wc})")
    for name in ("hier16        ", "str8 apx qc32 "):
        gp = dict(cfgs)[name]
        try:
            dt, rec = run(
                gp, qc_d=jnp.asarray(qc8, jnp.int32),
                qv_d=jnp.asarray(qv8, jnp.float32), caps=caps8,
                gt=gt_ids[:B], reps=6)
            log(f"e2e B=8192 {name}: {dt*1e3:7.2f} ms  "
                f"recall@10(first4096)={rec:.4f} QPS={8192/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"e2e B=8192 {name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
