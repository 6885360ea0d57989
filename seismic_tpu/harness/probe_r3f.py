"""Round-3 probe F, one TPU session: vocab ladder on the 100K bench
index (per-list adaptive V, search/ladder.py) x kernel unroll.

  1. host: class histogram + tile-pool bytes vs the plain V=1024 layout
  2. e2e + recall at B=4096: ladder {U1, U8} (plans precomputed; host
     planning timed separately)
  3. B=8192 / B=16384 e2e with U8

Usage: python -m seismic_tpu.harness.probe_r3f [coverage] [v0]
"""
from __future__ import annotations

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

    import dataclasses

    import jax
    import jax.numpy as jnp

    from seismic_tpu.search.grouped import DevicePlan, GroupedParams
    from seismic_tpu.search.ladder import (
        _ladder_jit,
        ladder_contexts,
        prepare_ladder,
    )
    from seismic_tpu.search.planner import plan_grouped

    coverage = float(sys.argv[1]) if len(sys.argv) > 1 else 0.995
    v0 = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    vclasses = (v0, 1024)
    log("devices:", jax.devices())
    ds = bench.get_dataset()
    arrays, _ = bench.get_index(ds)
    assert arrays.vocab_rank is not None, "index lacks ladder metadata"
    q_comps, q_vals = bench.get_queries(bench.DIM)
    gt_ids = bench.get_ground_truth(ds, q_comps, q_vals)
    for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
              "summary_codes", "dense_summary", "dense_scale",
              "block_sketch", "block_sketch_scale", "doc_sketch",
              "doc_sketch_scale"):
        setattr(arrays, f, None)

    # ---- 1. host prep + stats ----
    t0 = time.time()
    list_class, hosts = prepare_ladder(arrays, vclasses,
                                       coverage=coverage, csub=bench.CSUB)
    prep_s = time.time() - t0
    n_active = int((np.asarray(arrays.list_len) > 0).sum())
    plain_rows = int(np.asarray(arrays.doc_tiles).shape[0])
    tot = 0
    for c, h in enumerate(hosts):
        frac = float(((list_class == c)
                      & (np.asarray(arrays.list_len) > 0)).sum()) / n_active
        b = h["tiles"].nbytes + h["scale3d"].nbytes
        tot += b
        log(f"class {c}: V={h['V']} ll_max={h['ll_max']} "
            f"lists={frac:.1%} tile_mb={b/1e6:,.0f}")
    log(f"prep {prep_s:.1f}s; ladder tiles {tot/1e6:,.0f} MB vs plain "
        f"~{plain_rows * 1024 * 1.125 / 1e6:,.0f} MB (V=1024 aligned)")

    t0 = time.time()
    index = arrays.to_device(ladder=vclasses, tile_csub=bench.CSUB,
                             _ladder_prepped=(list_class, hosts))
    ctxs = ladder_contexts(arrays, list_class, hosts, csub=bench.CSUB)
    _sync(index.ladder[0].tiles)
    log(f"to_device(ladder)+ctx: {time.time()-t0:.1f}s")

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

    plan_cache = {}

    def plans_for(B):
        if B not in plan_cache:
            qc, qv = queries_for(B)
            t0 = time.time()
            ps = tuple(plan_grouped(qc, qv, ctx, QCUT, M=8)
                       for ctx in ctxs)
            t1 = time.time()
            plan_cache[B] = tuple(DevicePlan.put(p) for p in ps)
            log(f"  host planning B={B}: {t1-t0:.2f}s "
                f"(caps {[p.slot_b.shape + p.work_g.shape for p in ps]})")
        return plan_cache[B]

    def run(gp, B, reps=10, with_recall=True):
        qc, qv = queries_for(B)
        plans = plans_for(B)
        qc_d = jnp.asarray(qc, jnp.int32)
        qv_d = jnp.asarray(qv, jnp.float32)
        out = _ladder_jit(index, plans, qc_d, qv_d, gp)
        _sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = _ladder_jit(index, plans, qc_d, qv_d, gp)
        _sync(out)
        dt = (time.time() - t0) / reps
        rec = -1.0
        if with_recall:
            ids = np.asarray(out[1])
            g_ref = gt_ids[: min(B, len(gt_ids))]
            rec = recall_at_k(ids[: len(g_ref)], g_ref)
        return dt, rec

    base = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                         compute_dtype="i8", pool_mode="stride",
                         pool_stride=8, pool_select="approx")
    # ---- 2. e2e at B=4096 ----
    for U in (1, 8):
        gp = dataclasses.replace(base, kernel_unroll=U)
        try:
            dt, rec = run(gp, 4096)
            log(f"e2e B=4096 ladder{v0}/1024 c{coverage} U{U}: "
                f"{dt*1e3:7.2f} ms  recall@10={rec:.4f} QPS={4096/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"e2e ladder U{U}: FAILED {type(e).__name__}: {e}")

    # pool sensitivity (per-class pool is half the concat tail width)
    for pool in (48, 96):
        gp = dataclasses.replace(base, kernel_unroll=8, pool=pool)
        try:
            dt, rec = run(gp, 4096, reps=6)
            log(f"e2e B=4096 ladder pool{pool} U8: {dt*1e3:7.2f} ms  "
                f"recall@10={rec:.4f} QPS={4096/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"e2e pool{pool}: FAILED {type(e).__name__}: {e}")

    # ---- 3. big-batch e2e ----
    for B in (8192, 16384):
        gp = dataclasses.replace(base, kernel_unroll=8)
        try:
            dt, rec = run(gp, B, reps=6)
            log(f"e2e B={B} ladder U8: {dt*1e3:7.2f} ms  "
                f"recall@10(first4096)={rec:.4f} QPS={B/dt:,.0f}")
        except Exception as e:  # noqa: BLE001
            log(f"e2e B={B}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
