"""Round-5 probe A, one TPU session: TWO-PASS ADAPTIVE POOLS at 1M docs
(VERDICT r4 ask #2: recall >= 0.97 at >= 20K QPS at 1M — fixed pools
topped out at 0.9692 @ 16.6K QPS because a fixed pool pays the p999
pool-depth worst case for every query; docs/Roadmap.md round-4 state).

Protocol (search/twopass.py): pass 1 cheap fixed program over B=2048,
host compaction of the flagged (low pool-truncation margin) queries into
a B2=256 batch, pass 2 deep (wider qc, p1024/r512, optional knn8).
Measured e2e including the host sync + compaction between passes.

Grid: pass-1 depth x eps_rel x pass-2 recipe; margin percentiles are
logged once to place the eps knee. Writes SCALE_BENCH.json
rungs_r5_twopass (incremental).

Usage: python -m seismic_tpu.harness.probe_r5a [width]
  width in {512, 1024} (default 1024); needs the c1m cache
  (.bench_cache/index_1000000_* + gt + knn16).
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

os.environ.setdefault("BENCH_N_DOCS", "1000000")
os.environ.setdefault("BENCH_N_QUERIES", "2048")
os.environ.setdefault("BENCH_BATCH", "2048")
os.environ.setdefault("BENCH_N_POSTINGS", "400")
os.environ.setdefault("BENCH_TILE_OVERFLOW", "0")


def _write_rungs(rows, meta):
    path = os.path.join(ROOT, "SCALE_BENCH.json")
    art = {}
    if os.path.exists(path):
        with open(path) as f:
            art = json.load(f)
    art["rungs_r5_twopass"] = {
        "note": (
            "round-5 two-pass adaptive pools at 1M docs (search/"
            "twopass.py): pass 1 cheap fixed pool + margin, host "
            "compaction, pass 2 deep on the flagged ~B2/B fraction. "
            "QPS is e2e including the inter-pass host sync. The TPU "
            "recast of the reference's per-query heap adaptivity "
            "(src/posting_list.rs:130,169)."
        ),
        **meta,
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
    from seismic_tpu.search.grouped import GroupedParams
    from seismic_tpu.search.planner import PlannerContext
    from seismic_tpu.search.twopass import (
        TwoPassParams,
        search_batch_twopass,
    )
    from seismic_tpu.types import KNN_SUFFIX, IndexArrays

    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    base = os.path.join(
        bench.CACHE,
        f"index_{bench.N_DOCS}_{bench.DIM}_{bench.N_POSTINGS}"
        f"_v{bench.V_CAP}_o{bench.TILE_OVERFLOW}")
    log("devices:", jax.devices())
    q_comps, q_vals = bench.get_queries(bench.DIM)
    with np.load(os.path.join(
            bench.CACHE,
            f"gt_{bench.N_DOCS}_{bench.DIM}_{len(q_comps)}.npz")) as z:
        gt_ids = z["ids"]
    knn_path = base + ".knn16"
    knn_host = (knn_mod.load_knn(knn_path)
                if os.path.exists(knn_path + KNN_SUFFIX) else None)
    log(f"knn graph: {'loaded' if knn_host is not None else 'MISSING'}")

    path = base + ".dir" if W == 1024 else base + f"_nw{W}.dir"
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
    hbm = int(sum(x.nbytes for x in jax.tree.leaves(index)
                  if hasattr(x, "nbytes")))
    ixk = index
    if knn_host is not None:
        ixk = dataclasses.replace(
            index, knn=jax.device_put(jnp.asarray(knn_host)))
        hbm_k = hbm + int(knn_host.nbytes)
    log(f"[W={W}] load+to_device+ctx: {time.time()-t0:.1f}s "
        f"HBM={hbm/1e9:.2f}GB")

    B = 2048
    qn, vn = q_comps[:B], q_vals[:B]
    gt = gt_ids[:B]
    rows = []

    def run_tp(tp, reps=4):
        # warm both programs (pass 2 compiles only if something flags;
        # eps=+inf pre-warm would distort shapes — run once as-is)
        s, i, st = search_batch_twopass(ixk, ctx, qn, vn, tp)
        t0 = time.time()
        for _ in range(reps):
            s, i, st = search_batch_twopass(ixk, ctx, qn, vn, tp)
        dt = (time.time() - t0) / reps
        return dt, recall_at_k(i, gt), st

    # ---- margin landscape at the pass-1 recipe (one-time log) ----
    from seismic_tpu.search.grouped import plan_caps, \
        search_grouped_derive_jit

    base_p1 = GroupedParams(k=10, score_cut=64, pool=128, rescore=96,
                            compute_dtype="i8", pool_mode="hier",
                            pool_per_pair=16, kernel_unroll=8,
                            return_margin=True)
    gc, wc = plan_caps(qn, vn, ctx, 14, M=8)
    s1, i1, margin = search_grouped_derive_jit(
        index, jnp.asarray(qn, jnp.int32), jnp.asarray(vn, jnp.float32),
        base_p1, 14, 8, gc, wc, ctx.zero_region)
    margin = np.asarray(margin)
    kth = np.asarray(s1)[:, 9]
    rel = margin / np.maximum(kth, 1e-6)
    r1 = recall_at_k(np.asarray(i1), gt)
    log(f"pass1 qc14 p128/r96: recall={r1:.4f}; margin pct "
        f"p1={np.percentile(rel, 1):.4f} p5={np.percentile(rel, 5):.4f} "
        f"p10={np.percentile(rel, 10):.4f} p25={np.percentile(rel, 25):.4f} "
        f"p50={np.percentile(rel, 50):.4f}")
    # per-query miss count vs rel-margin correlation (is the flag right?)
    miss = np.array([10 - len({int(x) for x in a[:10] if x >= 0}
                              & {int(x) for x in g[:10]})
                     for a, g in zip(np.asarray(i1), gt)])
    for thr in (0.02, 0.05, 0.1, 0.2, 0.4):
        f = rel < thr
        log(f"  rel<{thr}: flag {f.mean()*100:5.1f}%  catches "
            f"{miss[f].sum()}/{miss.sum()} missed docs")

    meta = {"W": W, "batch": B, "device_bytes": hbm,
            "pass1_recall": round(r1, 4)}

    p2_deep = GroupedParams(k=10, score_cut=64, pool=1024, rescore=512,
                            compute_dtype="i8", pool_mode="hier",
                            pool_per_pair=64, kernel_unroll=8)
    p2_knn = dataclasses.replace(p2_deep, n_knn=8, pool_mode="approx",
                                 pool_per_pair=0)
    # bf16 pass 2: device 1M rungs run ~1pt below the fp pool simulator
    # (i8 qloc quantization perturbs pool ORDER); the flagged batch is
    # only ~B2/B of the work, so the 2x kernel-rate cost is amortized
    p2_bf16 = dataclasses.replace(p2_deep, compute_dtype="bf16",
                                  kernel_unroll=1)

    for qc1, pool1, r1_ in ((14, 128, 96), (16, 128, 96), (14, 96, 64)):
        p1 = dataclasses.replace(base_p1, pool=pool1, rescore=r1_,
                                 return_margin=False)
        for eps_rel in (0.05, 0.1, 0.2):
            for p2_name, p2, qc2 in (("deep", p2_deep, 20),
                                     ("deep_knn8", p2_knn, 20),
                                     ("deep_bf16", p2_bf16, 20)):
                if p2.n_knn > 0 and knn_host is None:
                    continue
                if p2_name == "deep_bf16" and (
                        (qc1, pool1, eps_rel) != (14, 128, 0.1)):
                    continue  # one bf16 data point is enough
                tp = TwoPassParams(
                    pass1=p1, pass2=p2, query_cut1=qc1, query_cut2=qc2,
                    eps=0.0, eps_rel=eps_rel, b2_frac=0.125, b2_min=256)
                try:
                    dt, rec, st = run_tp(tp)
                    log(f"2pass W{W} qc{qc1} p{pool1}/r{r1_} "
                        f"eps{eps_rel} -> {p2_name} qc{qc2}: "
                        f"{dt*1e3:7.2f} ms  recall@10={rec:.4f} "
                        f"QPS={B/dt:,.0f} flagged={st['flagged']}")
                    rows.append({
                        "W": W, "qc1": qc1, "pool1": pool1,
                        "rescore1": r1_, "eps_rel": eps_rel,
                        "pass2": p2_name, "qc2": qc2,
                        "pool2": p2.pool, "rescore2": p2.rescore,
                        "flagged": st["flagged"], "b2": st["b2"],
                        "ms_per_batch": round(dt * 1e3, 2),
                        "qps": round(B / dt, 1),
                        "recall_at_10": round(rec, 4)})
                    _write_rungs(rows, meta)
                except Exception as e:  # noqa: BLE001
                    log(f"qc{qc1}/eps{eps_rel}/{p2_name}: FAILED "
                        f"{type(e).__name__}: {e}")
    log("wrote SCALE_BENCH.json rungs_r5_twopass")


if __name__ == "__main__":
    main()
