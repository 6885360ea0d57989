"""Round-5 probe C, one TPU session: the 1M BAR (VERDICT r4 ask #2,
recall >= 0.97 at >= 20K QPS at 1M docs) via a better FIXED rung.

Round-5 findings that shape this grid:
  - the two-pass margin flag is dead (probe_r5a: misses sit at rel
    margin 0.2-0.4, indistinguishable from non-misses — i8 score noise
    swamps the truncation signal; flag 0.9% catches 34/1193 misses);
  - hier pool costs ~1.2pt at 1M vs approx (r4e 0.9512 vs r3q 0.9631 at
    the same shape: the per-pair cap truncates the skewed RANKED tail,
    p999 pool depth 583);
  - i8 qloc quantization costs ~1pt of POOL ORDER (probe_r5a header):
    compute_dtype="bf16" keeps u8 tile codes exact and rounds only the
    qloc operand to bf16 — near-fp pool order at 2x kernel-rate cost.

So: pool_mode="approx" + compute_dtype="bf16" for pool ORDER, knn_top
(refine only the top-m heap entries, reference Knn::refine economics
src/inverted_index.rs:551-593) + dedup_mode="post" for the QPS side.

First r5c session's lessons (the W=1024 index is 14.93GB of the chip's
16GB): (a) jax.clear_caches() is NOT enough — the third program OOMed
and every later compile in that process failed (the remote-compile
helper wedges after a ResourceExhausted) — so families run as OWN
PROCESSES like probe_r5b; (b) stage budgets compile 6 extra programs,
so they are opt-in (family "stage"); (c) compute_dtype=bf16 matched i8
recall exactly (0.9692) — the 1M gap is RESCORE-TRUNCATION, not pool
order, so the recall lever is rescore depth / qc, and bf16's remaining
value is pool_dtype (halves the wall + scratch).

Writes SCALE_BENCH.json rungs_r5_bar (incremental; done labels skip).

Usage: python -m seismic_tpu.harness.probe_r5c [width] [family ...]
  families: lever deep bar stage b4k lean16 b4kf  (default: lever deep)
  lean16/b4kf need R5C_FWD16=1 (half-width packed forward twin).
  needs the c1m cache (.bench_cache/index_1000000_* + gt + knn16).
"""
from __future__ import annotations

import dataclasses
import faulthandler
import json
import os
import sys
import time

import numpy as np

faulthandler.dump_traceback_later(8000, exit=True)
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)

os.environ.setdefault("BENCH_N_DOCS", "1000000")
os.environ.setdefault("BENCH_N_QUERIES", "2048")
os.environ.setdefault("BENCH_BATCH", "2048")
os.environ.setdefault("BENCH_N_POSTINGS", "400")
os.environ.setdefault("BENCH_TILE_OVERFLOW", "0")

BAR_RECALL = 0.97
BAR_QPS = 20000.0


def _load_rows():
    path = os.path.join(ROOT, "SCALE_BENCH.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f).get("rungs_r5_bar", {}).get("rungs", [])
    return []


def _write_rungs(rows, meta):
    path = os.path.join(ROOT, "SCALE_BENCH.json")
    art = {}
    if os.path.exists(path):
        with open(path) as f:
            art = json.load(f)
    art["rungs_r5_bar"] = {
        "note": (
            "round-5 1M bar rungs (probe_r5c): pool_mode=approx (hier's "
            "per-pair cap loses ~1.2pt at 1M), compute_dtype=bf16 "
            "(recovers the ~1pt of pool order i8 qloc costs), knn_top + "
            "dedup_mode=post as QPS levers. Bar: recall>=0.97 at >=20K "
            "QPS (VERDICT r4 ask #2)."
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
    faulthandler.dump_traceback_later(8000, exit=True)

    import jax
    import jax.numpy as jnp

    bench.enable_compile_cache()

    from seismic_tpu.search import knn as knn_mod
    from seismic_tpu.search.grouped import (
        GroupedParams,
        plan_caps,
        search_grouped_derive_jit,
    )
    from seismic_tpu.search.planner import PlannerContext
    from seismic_tpu.types import KNN_SUFFIX, IndexArrays

    args = sys.argv[1:]
    W = int(args.pop(0)) if args and args[0].isdigit() else 1024
    fams = set(args) or {"lever", "deep"}
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
    # R5C_FWD16=1: half-width packed forward twin (comp i16 | f16 value
    # per i32 word) — frees ~1 GB at the W=1024 point and halves the
    # rescore gather temps, the round-5 compile-wall lever
    fwd16 = os.environ.get("R5C_FWD16", "0") == "1"
    # on-disk aligned-layout cache: the ~25-30 min single-core gather is
    # paid once; every fresh-process family after that mmaps it
    from seismic_tpu.ops_pallas_prep import load_or_build_aligned

    aligned = load_or_build_aligned(arrays, path, bench.CSUB)
    index = arrays.to_device(pallas_tiles=True, tile_csub=bench.CSUB,
                             fwd_f16=fwd16, _aligned=aligned)
    ctx = PlannerContext.from_arrays(arrays, csub=bench.CSUB)
    _sync(index.doc_tiles_aligned)
    hbm = int(sum(x.nbytes for x in jax.tree.leaves(index)
                  if hasattr(x, "nbytes")))
    if knn_host is not None:
        index = dataclasses.replace(
            index, knn=jax.device_put(jnp.asarray(knn_host)))
        hbm += int(knn_host.nbytes)
    log(f"[W={W}] load+to_device+ctx: {time.time()-t0:.1f}s "
        f"HBM={hbm/1e9:.2f}GB")

    B = 2048
    M = 8
    qn, vn = q_comps[:B], q_vals[:B]
    qd = jnp.asarray(qn, jnp.int32)
    vd = jnp.asarray(vn, jnp.float32)
    gt = gt_ids[:B]
    rows = _load_rows()
    done = {r.get("label") for r in rows}
    meta = {"W": W, "batch": B, "M": M, "device_bytes": hbm}
    if fwd16:
        meta["device_bytes_fwd16"] = hbm
    caps = {}

    def run(gp, qcut, label, reps=4, stage=False):
        if label in done:
            log(f"{label}: skipped (already measured)")
            prior = next(r for r in rows if r.get("label") == label)
            ms = prior.get("ms_per_batch")
            rec = prior.get("recall_at_10")
            return ((ms / 1e3) if isinstance(ms, (int, float)) else None,
                    rec if isinstance(rec, float) else None)
        # drop prior executables: their scratch reservations accumulate
        # and OOMed probe_r5b after ~6 distinct programs on this chip
        jax.clear_caches()
        if qcut not in caps:
            caps[qcut] = plan_caps(qn, vn, ctx, qcut, M=M)
        gc, wc = caps[qcut]
        out = search_grouped_derive_jit(
            index, qd, vd, gp, qcut, M, gc, wc, ctx.zero_region)
        _sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = search_grouped_derive_jit(
                index, qd, vd, gp, qcut, M, gc, wc, ctx.zero_region)
        _sync(out)
        dt = (time.time() - t0) / reps
        rec = recall_at_k(np.asarray(out[1]), gt)
        log(f"{label}: {dt*1e3:7.2f} ms  recall@10={rec:.4f} "
            f"QPS={B/dt:,.0f}")
        row = {"label": label, "W": W, "query_cut": qcut,
               "pool": gp.pool, "rescore": gp.rescore,
               "compute_dtype": gp.compute_dtype,
               "pool_dtype": gp.pool_dtype, "n_knn": gp.n_knn,
               "knn_top": gp.knn_top, "dedup_mode": gp.dedup_mode,
               "fwd_f16": fwd16, "rescore_chunk": gp.rescore_chunk,
               "ms_per_batch": round(dt * 1e3, 2),
               "qps": round(B / dt, 1), "recall_at_10": round(rec, 4)}
        if stage:
            budget = {}
            for st in ("qloc", "expand", "kernel", "regroup", "pool",
                       "prerank"):
                gs = dataclasses.replace(gp, stop_after=st)
                try:
                    o = search_grouped_derive_jit(
                        index, qd, vd, gs, qcut, M, gc, wc,
                        ctx.zero_region)
                    _sync(o)
                    t1 = time.time()
                    for _ in range(3):
                        o = search_grouped_derive_jit(
                            index, qd, vd, gs, qcut, M, gc, wc,
                            ctx.zero_region)
                    _sync(o)
                    budget[st] = round((time.time() - t1) / 3 * 1e3, 2)
                except Exception as e:  # noqa: BLE001
                    budget[st] = f"err {type(e).__name__}"
            row["stage_ms_cum"] = budget
            log(f"  stage budget (cumulative): {budget}")
        rows.append(row)
        _write_rungs(rows, meta)
        return dt, rec

    i8 = GroupedParams(k=10, score_cut=64, pool=512, rescore=256,
                       compute_dtype="i8", pool_mode="approx",
                       pool_per_pair=0, kernel_unroll=8)
    base = dataclasses.replace(i8, n_knn=8)  # 0.9692 @ 16.5K (session 1)

    def safe(gp, qcut, label, **kw):
        try:
            return run(gp, qcut, label, **kw)
        except Exception as e:  # noqa: BLE001
            log(f"{label}: FAILED {type(e).__name__}: {e}")
            return None, None

    if "stage" in fams:
        # stage budgets compile 6 extra programs — own process only
        safe(base, 16, "i8_knn8_qc16_p512r256_stage", stage=True)

    if "lever" in fams:
        # the three QPS levers on the best session-1 recipe, stacked one
        # at a time (each ~halves a specific tail stage's cost):
        # pool_dtype=bf16 (pool wall bytes + PartialReduce), knn_top=4
        # (refine gathers 4*8 instead of 10*8 neighbor rows), ddpost
        # (skips the pool-wide variadic sort)
        safe(dataclasses.replace(base, pool_dtype="bf16"), 16,
             "i8_knn8_pdt_qc16_p512r256")
        safe(dataclasses.replace(base, pool_dtype="bf16", knn_top=4), 16,
             "i8_knn8top4_pdt_qc16_p512r256")
        safe(dataclasses.replace(base, pool_dtype="bf16", knn_top=4,
                                 dedup_mode="post"), 16,
             "i8_knn8top4_pdt_ddpost_qc16_p512r256")
        # pool_recall 0.9: approx_max_k keeps fewer entries per lane
        # tile — cheaper PartialReduce over the 1M wall (38.4ms of
        # 124ms); recall cost measured right here
        safe(dataclasses.replace(base, pool_dtype="bf16", knn_top=4,
                                 dedup_mode="post", pool_recall=0.9), 16,
             "i8_knn8top4_pdt_ddpost_pr90_qc16_p512r256")

    if "deep" in fams:
        # the recall side: the 1M gap is rescore truncation (bf16 pool
        # order changed nothing), so buy recall with rescore depth and
        # qc on TOP of the lever stack, then see what QPS survives
        lev = dataclasses.replace(base, pool_dtype="bf16", knn_top=4,
                                  dedup_mode="post")
        safe(dataclasses.replace(lev, rescore=384), 16,
             "i8_knn8top4_pdt_ddpost_qc16_p512r384")
        safe(dataclasses.replace(lev, pool=768, rescore=384), 16,
             "i8_knn8top4_pdt_ddpost_qc16_p768r384")
        safe(lev, 20, "i8_knn8top4_pdt_ddpost_qc20_p512r256")

    if "bar" in fams:
        # final adaptive family: pick the highest-recall measured recipe
        # and walk its cheapest compliant neighborhood
        lev = dataclasses.replace(base, pool_dtype="bf16", knn_top=4,
                                  dedup_mode="post")
        best = max((r for r in rows
                    if isinstance(r.get("recall_at_10"), float)),
                   key=lambda r: r["recall_at_10"], default=None)
        if best and best["recall_at_10"] >= BAR_RECALL:
            # shave cost under the compliant point
            safe(dataclasses.replace(lev, pool=max(
                256, best["pool"] // 2), rescore=best["rescore"]),
                best["query_cut"],
                f"bar_halfpool_qc{best['query_cut']}")
        else:
            safe(dataclasses.replace(lev, pool=768, rescore=512), 20,
                 "i8_knn8top4_pdt_ddpost_qc20_p768r512")
            safe(dataclasses.replace(lev, n_knn=16, knn_top=4,
                                     rescore=384), 16,
                 "i8_knn16top4_pdt_ddpost_qc16_p512r384")

    if "lean16" in fams:
        # fused16 forward (R5C_FWD16=1 required): ~1 GB HBM back + half
        # the rescore gather temps -> the r384 deep-rescore programs that
        # crashed the remote compile helper (r5c_deep) should now compile.
        # rescore_chunk=128 bounds the gather temps further.
        assert fwd16, "run family lean16 with R5C_FWD16=1"
        lev = dataclasses.replace(base, pool_dtype="bf16", knn_top=4,
                                  dedup_mode="post")
        # sanity: the compliant qc20 recipe on the fused16 index
        safe(lev, 20, "f16_knn8top4_pdt_ddpost_qc20_p512r256")
        # the recall lever that was compile-blocked: rescore depth
        safe(dataclasses.replace(lev, rescore=384, rescore_chunk=128),
             16, "f16_knn8top4_pdt_ddpost_qc16_p512r384c128")
        safe(dataclasses.replace(lev, rescore=384, rescore_chunk=128),
             20, "f16_knn8top4_pdt_ddpost_qc20_p512r384c128")
        safe(dataclasses.replace(lev, n_knn=16, rescore=384,
                                 rescore_chunk=128), 16,
             "f16_knn16top4_pdt_ddpost_qc16_p512r384c128")

    if fams & {"b4k", "b4kf"}:
        # batch amortization at 1M: every prior 1M rung ran B=2048 M=8;
        # B=16384 bought +7% at 100K (probe r3d). 4096 DISTINCT queries
        # (seeds continue the bench stream, so rows 0-2047 match the
        # cached GT); timing at B=4096, recall on the GT'd half.
        bench.N_QUERIES = 4096  # module global read by get_queries
        q4, v4 = bench.get_queries(bench.DIM)
        assert np.array_equal(q4[:2048], qn), "query stream mismatch"
        q4d = jnp.asarray(q4, jnp.int32)
        v4d = jnp.asarray(v4, jnp.float32)
        lev = dataclasses.replace(base, pool_dtype="bf16", knn_top=4,
                                  dedup_mode="post")

        def run4k(gp, qcut, label, reps=4, M4=M):
            if label in done:
                log(f"{label}: skipped (already measured)")
                return
            jax.clear_caches()
            gc, wc = plan_caps(q4, v4, ctx, qcut, M=M4)
            out = search_grouped_derive_jit(
                index, q4d, v4d, gp, qcut, M4, gc, wc, ctx.zero_region)
            _sync(out)
            t0 = time.time()
            for _ in range(reps):
                out = search_grouped_derive_jit(
                    index, q4d, v4d, gp, qcut, M4, gc, wc,
                    ctx.zero_region)
            _sync(out)
            dt = (time.time() - t0) / reps
            rec = recall_at_k(np.asarray(out[1])[:2048], gt)
            log(f"{label}: {dt*1e3:7.2f} ms  recall@10={rec:.4f} "
                f"QPS={4096/dt:,.0f}")
            rows.append({"label": label, "W": W, "batch": 4096,
                         "M": M4, "query_cut": qcut, "pool": gp.pool,
                         "rescore": gp.rescore, "n_knn": gp.n_knn,
                         "knn_top": gp.knn_top,
                         "dedup_mode": gp.dedup_mode,
                         "fwd_f16": fwd16,
                         "rescore_chunk": gp.rescore_chunk,
                         "ms_per_batch": round(dt * 1e3, 2),
                         "qps": round(4096 / dt, 1),
                         "recall_at_10": round(rec, 4)})
            _write_rungs(rows, meta)

        if "b4k" in fams:
            # rescore=384 programs crash the remote compile helper at the
            # 14.93GB W=1024 point (r5c_deep: HTTP 500 on both r384 rungs
            # — scratch headroom is ~1GB); the compliant recipe is qc20
            # p512/r256 (0.9706 @ 16.0K at B=2048). B=4096 amortizes the
            # per-batch stages for the missing QPS. (MEASURED: every
            # B=4096 program ALSO crashed the helper at 14.93GB — see
            # b4kf, the fused16 retry.)
            for gp, qcut, lbl in (
                (lev, 20, "b4k_knn8top4_pdt_ddpost_qc20_p512r256"),
                (lev, 16, "b4k_knn8top4_pdt_ddpost_qc16_p512r256"),
                (dataclasses.replace(lev, pool=256, rescore=256), 20,
                 "b4k_knn8top4_pdt_ddpost_qc20_p256r256"),
            ):
                try:
                    run4k(gp, qcut, lbl)
                except Exception as e:  # noqa: BLE001
                    log(f"{lbl}: FAILED {type(e).__name__}: {e}")

        if "b4kf" in fams:
            # B=4096 retry on the fused16 index (~1 GB freed) with
            # chunked rescore (bounded gather temps): the two compile-
            # wall levers together. M=16 variants probe group fill at
            # the bigger batch (hot lists stream once per 16 queries —
            # +12% at 100K B=16384, probe_r4a).
            assert fwd16, "run family b4kf with R5C_FWD16=1"
            levc = dataclasses.replace(lev, rescore_chunk=128)
            for gp, qcut, lbl, m4 in (
                (levc, 20, "b4kf_knn8top4_pdt_ddpost_qc20_p512r256", 8),
                (levc, 20, "b4kf_m16_knn8top4_pdt_ddpost_qc20_p512r256",
                 16),
                (dataclasses.replace(levc, rescore=384), 16,
                 "b4kf_m16_knn8top4_pdt_ddpost_qc16_p512r384c128", 16),
                (dataclasses.replace(levc, rescore=384), 20,
                 "b4kf_m16_knn8top4_pdt_ddpost_qc20_p512r384c128", 16),
            ):
                try:
                    run4k(gp, qcut, lbl, M4=m4)
                except Exception as e:  # noqa: BLE001
                    log(f"{lbl}: FAILED {type(e).__name__}: {e}")

    best = max((r for r in rows if isinstance(r.get("recall_at_10"),
                                              float)),
               key=lambda r: (r["recall_at_10"] >= BAR_RECALL,
                              r["qps"]), default=None)
    if best:
        log(f"best rung: {best['label']} recall={best['recall_at_10']} "
            f"QPS={best['qps']:,.0f} (bar: >={BAR_RECALL} at "
            f">={BAR_QPS:,.0f})")
    log("wrote SCALE_BENCH.json rungs_r5_bar")


if __name__ == "__main__":
    main()
