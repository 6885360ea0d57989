"""Round-4 probe E, one TPU session: close the 1M recall bar with
multi-round kNN refinement (VERDICT r3 ask #2: recall >= 0.97 at 1M
docs at >= 20K QPS).

probe_r3q's 1M grid topped out at W=1024 qc16 p512/r256 knn8 ->
0.9692 @ 16.6K QPS — 0.8pt short of the bar and 17% short on QPS, and
its knn rungs pooled in `approx` mode (the hier pool holds +1-1.5pt at
equal depth, r3q plain rungs). Two stacked levers this probe measures:

  1. hier pool UNDER the knn rungs (r3q used approx): base recall at
     qc16 p256 rises 0.9334 -> 0.9450, so the graph has a better seed
     set to walk from.
  2. knn_rounds=2 (grouped.py GroupedParams.knn_rounds): a depth-2
     graph walk — rescore the neighbors of the REFINED top-k once
     more. Costs one extra k*n_knn-row exact-rescore round (~80-160
     rows vs the pool's 128-256), buys what one round leaves on the
     table. The reference's Knn::refine (inverted_index.rs:551-593)
     is one round; depth-2 has no reference equivalent.

Grid: W1024 hier qc{16,20} x pool{256/128, 384/192} x knn{8,16} x
rounds{1,2}, then the W512 QPS-side points (half stream cost) at the
recall winners. Rungs merge into SCALE_BENCH.json["rungs_r4_knn_rounds"]
incrementally.

Usage: python -m seismic_tpu.harness.probe_r4e [width ...]
  width in {1024, 512}; loads
  .bench_cache/index_1000000_30522_400_v1024_o0[_nw{width}].dir
  + the knn16 graph (built by the c1m rebuild stage).
"""
from __future__ import annotations

import dataclasses
import faulthandler
import json
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


def _write_rungs(rows, hbm_by_width):
    path = os.path.join(ROOT, "SCALE_BENCH.json")
    art = {}
    if os.path.exists(path):
        with open(path) as f:
            art = json.load(f)
    art["rungs_r4_knn_rounds"] = {
        "note": (
            "round-4 probe_r4e: hier pool under the knn rungs + "
            "multi-round graph refinement (knn_rounds=2) at 1M docs, "
            "B=2048, grouped i8 derive path. Target: recall>=0.97 at "
            ">=20K QPS (VERDICT r3 ask #2)."
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

    widths = [int(a) for a in sys.argv[1:]] or [1024, 512]
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
    if not os.path.exists(knn_path + KNN_SUFFIX):
        log(f"MISSING knn graph {knn_path}{KNN_SUFFIX}; aborting")
        return
    knn_host = knn_mod.load_knn(knn_path)
    log(f"knn graph: {knn_host.shape}")

    base_gp = GroupedParams(k=10, score_cut=64, pool=256, rescore=128,
                            compute_dtype="i8", pool_mode="hier",
                            pool_per_pair=16, kernel_unroll=8, n_knn=8)
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
        index = dataclasses.replace(
            index, knn=jax.device_put(jnp.asarray(knn_host)))
        ctx = PlannerContext.from_arrays(arrays, csub=bench.CSUB)
        _sync(index.doc_tiles_aligned)
        log(f"[W={W}] load+to_device+ctx: {time.time()-t0:.1f}s")
        hbm = int(sum(x.nbytes for x in jax.tree.leaves(index)
                      if hasattr(x, "nbytes")))
        log(f"[W={W}] device HBM: {hbm/1e9:.2f} GB")
        hbm_by_width[str(W)] = hbm

        def run(gp, qcut, reps=4):
            qd = jnp.asarray(q_comps[:B], jnp.int32)
            vd = jnp.asarray(q_vals[:B], jnp.float32)
            gc, wc = plan_caps(q_comps[:B], q_vals[:B], ctx, qcut, M=8)
            out = search_grouped_derive_jit(
                index, qd, vd, gp, qcut, 8, gc, wc, ctx.zero_region)
            _sync(out)
            t0 = time.time()
            for _ in range(reps):
                out = search_grouped_derive_jit(
                    index, qd, vd, gp, qcut, 8, gc, wc, ctx.zero_region)
            _sync(out)
            dt = (time.time() - t0) / reps
            ids = np.asarray(out[1])
            g = gt_ids[: min(B, len(gt_ids))]
            return dt, recall_at_k(ids[: len(g)], g)

        def grid(qcut, pool, resc, nk, rounds, mode="hier"):
            gp = dataclasses.replace(
                base_gp, pool=pool, rescore=resc, n_knn=nk,
                knn_rounds=rounds, pool_mode=mode,
                pool_per_pair=16 if mode == "hier" else 0)
            label = f"{mode} qc{qcut} p{pool}/r{resc} knn{nk}x{rounds}"
            try:
                dt, rec = run(gp, qcut)
                log(f"e2e B={B} W{W} {label}: {dt*1e3:7.2f} ms  "
                    f"recall@10={rec:.4f} QPS={B/dt:,.0f}")
                rows.append({
                    "W": W, "mode": mode, "query_cut": qcut,
                    "pool": pool, "rescore": resc, "n_knn": nk,
                    "knn_rounds": rounds,
                    "ms_per_batch": round(dt * 1e3, 2),
                    "qps": round(B / dt, 1),
                    "recall_at_10": round(rec, 4)})
                _write_rungs(rows, hbm_by_width)
                return rec, B / dt
            except Exception as e:  # noqa: BLE001
                log(f"W{W} {label}: FAILED {type(e).__name__}: {e}")
                return -1.0, 0.0

        if W == 1024:
            # lever 1: hier pool under knn (r3q used approx here)
            grid(16, 256, 128, 8, 1)
            grid(16, 256, 128, 16, 1)
            # lever 2: depth-2 walk
            grid(16, 256, 128, 8, 2)
            grid(16, 256, 128, 16, 2)
            # deeper pool x rounds (r3q: p512 knn8x1 approx = 0.9692)
            grid(16, 384, 192, 16, 2)
            grid(16, 512, 256, 8, 2)
            # ceiling points
            grid(20, 256, 128, 16, 2)
            grid(20, 384, 192, 16, 2)
            # depth-3 at the sweet spot, if rounds=2 still gains
            grid(16, 256, 128, 16, 3)
        else:
            # W512 QPS-side: can the narrow width + deep walk make the
            # bar cheaper? (r3q W512 knn16 qc16 p256 = 0.9561 @ 22K)
            grid(16, 256, 128, 16, 2)
            grid(16, 384, 192, 16, 2)
            grid(20, 256, 128, 16, 2)
            grid(16, 512, 256, 16, 2)

        del index
        import gc as _gc

        _gc.collect()


if __name__ == "__main__":
    main()
