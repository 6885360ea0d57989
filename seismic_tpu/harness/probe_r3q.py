"""Round-3 probe Q, one TPU session: DEEP POOLS at 1M docs — the
recall-at-scale experiment that replaces the dead hashed-tile family.

probe_r3n's miss decomposition at 100K showed the pool, not the vocab,
binds recall once qc >= 12 (absent misses 0.57% at qc=14; present-doc
pool depth p99 ~ 40-70). SCALE_BENCH's 1M ceiling (~0.956) was measured
at pool64/r48 — this probe measures whether p128-512 pools (+ the knn
rung) lift the 1M ceiling to >= 0.97 at >= 20K QPS, and what narrowed
W=512 tiles (half kernel/stream cost, probe_r3n: equal pool quality at
qc>=13) do to the QPS side at scale.

Grid per tile width: qc x {hier,stride} x pool/rescore ladder at
B=2048, then a knn8 rung at the best qc. Stage budget at the deepest
point closes the session.

Usage: python -m seismic_tpu.harness.probe_r3q [width ...]
  width in {512, 1024}; loads
  .bench_cache/index_1000000_30522_400_v1024_o0[_nw{width}].dir
  (the c1m rebuild creates both; BENCH_* env pre-set to the 1M recipe)
"""
from __future__ import annotations

import dataclasses
import faulthandler
import os
import sys
import time

import numpy as np

faulthandler.dump_traceback_later(7000, exit=True)
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)

# the 1M bench recipe (SCALE_BENCH build), before bench import
os.environ.setdefault("BENCH_N_DOCS", "1000000")
os.environ.setdefault("BENCH_N_QUERIES", "2048")
os.environ.setdefault("BENCH_BATCH", "2048")
os.environ.setdefault("BENCH_N_POSTINGS", "400")
os.environ.setdefault("BENCH_TILE_OVERFLOW", "0")


def _write_scale_rungs(rows, hbm_by_width):
    """Merge this probe's measured rungs into SCALE_BENCH.json (round-4
    evidence: the 1M deep-pool + knn grid becomes a repo-root artifact,
    not just a probe log). Incremental: called after every width."""
    import json

    path = os.path.join(ROOT, "SCALE_BENCH.json")
    art = {}
    if os.path.exists(path):
        with open(path) as f:
            art = json.load(f)
    art["rungs_r4_deep_pools"] = {
        "note": (
            "round-4 probe_r3q: deep pools (p128-512) + knn8 at 1M docs "
            "on the v1024 build (W=1024 full tiles / W=512 narrowed), "
            "B=2048, grouped i8 kernel_unroll=8 derive path"
        ),
        "device_bytes_by_width": hbm_by_width,
        "rungs": rows,
    }
    with open(path, "w") as f:
        json.dump(art, f, indent=1)


def main():
    import bench
    from bench import _sync, log, recall_at_k

    faulthandler.cancel_dump_traceback_later()
    faulthandler.dump_traceback_later(7000, exit=True)

    import jax
    import jax.numpy as jnp

    from seismic_tpu.search import knn as knn_mod
    from seismic_tpu.search.grouped import (
        GroupedParams,
        plan_caps,
        search_grouped_derive_jit,
    )
    from seismic_tpu.search.planner import PlannerContext
    from seismic_tpu.types import KNN_SUFFIX, IndexArrays

    widths = [int(a) for a in sys.argv[1:]] or [512, 1024]
    base = os.path.join(
        bench.CACHE,
        f"index_{bench.N_DOCS}_{bench.DIM}_{bench.N_POSTINGS}"
        f"_v{bench.V_CAP}_o{bench.TILE_OVERFLOW}")
    log("devices:", jax.devices())
    q_comps, q_vals = bench.get_queries(bench.DIM)
    gt_path = os.path.join(
        bench.CACHE, f"gt_{bench.N_DOCS}_{bench.DIM}_{len(q_comps)}.npz")
    with np.load(gt_path) as z:
        gt_ids = z["ids"]
    knn_path = base + ".knn16"
    knn_host = (knn_mod.load_knn(knn_path)
                if os.path.exists(knn_path + KNN_SUFFIX) else None)
    log(f"knn graph: {'loaded' if knn_host is not None else 'MISSING'}")

    base_gp = GroupedParams(k=10, score_cut=64, pool=128, rescore=96,
                            compute_dtype="i8", pool_mode="hier",
                            pool_per_pair=16, kernel_unroll=8)
    B = 2048
    rows = []
    hbm_by_width = {}

    for W in widths:
        path = base + ".dir" if W == 1024 else base + f"_nw{W}.dir"
        if not os.path.isdir(path):
            log(f"[W={W}] MISSING {path}; skipping width")
            continue
        t0 = time.time()
        arrays = IndexArrays.load_dir(path)
        for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
                  "summary_codes", "dense_summary", "dense_scale",
                  "block_sketch", "block_sketch_scale", "doc_sketch",
                  "doc_sketch_scale"):
            setattr(arrays, f, None)
        index = arrays.to_device(pallas_tiles=True, tile_csub=bench.CSUB)
        ctx = PlannerContext.from_arrays(arrays, csub=bench.CSUB)
        _sync(index.doc_tiles_aligned)
        log(f"[W={W}] load+to_device+ctx: {time.time()-t0:.1f}s")
        hbm = int(sum(x.nbytes for x in jax.tree.leaves(index)
                      if hasattr(x, "nbytes")))
        log(f"[W={W}] device HBM: {hbm/1e9:.2f} GB")
        hbm_by_width[str(W)] = hbm

        def run(gp, qcut, reps=4, with_recall=True, ix=None):
            qd = jnp.asarray(q_comps[:B], jnp.int32)
            vd = jnp.asarray(q_vals[:B], jnp.float32)
            gc, wc = plan_caps(q_comps[:B], q_vals[:B], ctx, qcut, M=8)
            tgt = ix if ix is not None else index
            out = search_grouped_derive_jit(
                tgt, qd, vd, gp, qcut, 8, gc, wc, ctx.zero_region)
            _sync(out)
            t0 = time.time()
            for _ in range(reps):
                out = search_grouped_derive_jit(
                    tgt, qd, vd, gp, qcut, 8, gc, wc, ctx.zero_region)
            _sync(out)
            dt = (time.time() - t0) / reps
            rec = -1.0
            if with_recall:
                ids = np.asarray(out[1])
                g = gt_ids[: min(B, len(gt_ids))]
                rec = recall_at_k(ids[: len(g)], g)
            return dt, rec

        for qcut in (14, 16):
            for mode in ("hier", "stride"):
                for pool, resc in ((128, 96), (256, 128), (512, 256)):
                    gp = dataclasses.replace(
                        base_gp, pool=pool, rescore=resc, pool_mode=mode,
                        pool_per_pair=16 if mode == "hier" else 0)
                    try:
                        dt, rec = run(gp, qcut)
                        log(f"e2e B={B} W{W} {mode} U8 qc{qcut} "
                            f"pool{pool}/r{resc}: {dt*1e3:7.2f} ms  "
                            f"recall@10={rec:.4f} QPS={B/dt:,.0f}")
                        rows.append({
                            "W": W, "mode": mode, "query_cut": qcut,
                            "pool": pool, "rescore": resc,
                            "ms_per_batch": round(dt * 1e3, 2),
                            "qps": round(B / dt, 1),
                            "recall_at_10": round(rec, 4)})
                        _write_scale_rungs(rows, hbm_by_width)
                    except Exception as e:  # noqa: BLE001
                        log(f"W{W} {mode} qc{qcut} p{pool}/r{resc}: "
                            f"FAILED {type(e).__name__}: {e}")

        # qc=20 deep points (probe_r4c: ABSENT ceiling 0.9830 at qc20 —
        # the bar is pool-bound; these rungs buy ceiling headroom)
        for pool, resc in ((256, 128), (512, 256)):
            gp = dataclasses.replace(
                base_gp, pool=pool, rescore=resc, pool_mode="hier",
                pool_per_pair=16)
            try:
                dt, rec = run(gp, 20)
                log(f"e2e B={B} W{W} hier U8 qc20 pool{pool}/r{resc}: "
                    f"{dt*1e3:7.2f} ms  recall@10={rec:.4f} "
                    f"QPS={B/dt:,.0f}")
                rows.append({
                    "W": W, "mode": "hier", "query_cut": 20,
                    "pool": pool, "rescore": resc,
                    "ms_per_batch": round(dt * 1e3, 2),
                    "qps": round(B / dt, 1),
                    "recall_at_10": round(rec, 4)})
                _write_scale_rungs(rows, hbm_by_width)
            except Exception as e:  # noqa: BLE001
                log(f"W{W} hier qc20 p{pool}/r{resc}: "
                    f"FAILED {type(e).__name__}: {e}")

        # knn rungs (graph refine absorbs the pool-miss tail)
        if knn_host is not None:
            ixk = dataclasses.replace(
                index, knn=jax.device_put(jnp.asarray(knn_host)))
            for qcut, pool, resc, nk in ((14, 128, 96, 8),
                                         (14, 256, 128, 8),
                                         (16, 256, 128, 8),
                                         (16, 512, 256, 8),
                                         (16, 256, 128, 16)):
                gp = dataclasses.replace(
                    base_gp, pool=pool, rescore=resc, n_knn=nk,
                    pool_mode="approx", pool_per_pair=0)
                try:
                    dt, rec = run(gp, qcut, ix=ixk)
                    log(f"knn{nk} B={B} W{W} qc{qcut} pool{pool}/r{resc}: "
                        f"{dt*1e3:7.2f} ms  recall@10={rec:.4f} "
                        f"QPS={B/dt:,.0f}")
                    rows.append({
                        "W": W, "mode": f"knn{nk}", "query_cut": qcut,
                        "pool": pool, "rescore": resc, "n_knn": nk,
                        "ms_per_batch": round(dt * 1e3, 2),
                        "qps": round(B / dt, 1),
                        "recall_at_10": round(rec, 4)})
                    _write_scale_rungs(rows, hbm_by_width)
                except Exception as e:  # noqa: BLE001
                    log(f"knn{nk} W{W} qc{qcut} p{pool}/r{resc}: "
                        f"FAILED {type(e).__name__}: {e}")
            del ixk

        # stage budget at the deepest stride point
        for stage in ("qloc", "expand", "kernel", "regroup", "pool",
                      "prerank", "full"):
            gp = dataclasses.replace(
                base_gp, pool=512, rescore=256, pool_mode="stride",
                pool_per_pair=0,
                stop_after=None if stage == "full" else stage)
            try:
                dt, _ = run(gp, 16, reps=3, with_recall=False)
                log(f"  B={B} W{W} stride p512/r256 {stage:7s}: "
                    f"{dt*1e3:6.2f} ms")
            except Exception as e:  # noqa: BLE001
                log(f"  stage {stage}: FAILED {type(e).__name__}: {e}")

        del index
        import gc as _gc

        _gc.collect()


if __name__ == "__main__":
    main()
