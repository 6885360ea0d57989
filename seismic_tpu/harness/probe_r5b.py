"""Round-5 probe B, one TPU session: HEADLINE THROUGHPUT levers at the
100K bench point (VERDICT r4 ask #4: the chip is ~10% bandwidth-utilized
at 96.6K QPS; kill the pool+prerank tail and shrink rescore — target
>= 130K QPS at recall >= 0.97, B=16384).

Grid at the headline shapes (topv narrowed V=512, B=16384, M=16):

  base      hier pool (the round-4 headline recipe, qc13 p96/r64)
  stride    packed-index stride pool (8x smaller pool input; round-3
            measured NEUTRAL at B=4096 M8 — re-probed at B=16384 M16
            where the pool tail is 4x bigger)
  rowmajor  row-major i8 qloc kernel (skips the lane-major path's three
            materialized transposes; landed round 4, never TPU-measured)
  sc48      score_cut=48 (rescore + qloc term budget cut 25%; recall
            cost measured alongside)
  ddpost    dedup_mode="post" (skips the pool-wide variadic sort)
  knntop    knn16 with knn_top in {0, 4, 2} (VERDICT r4 ask #5: refine
            only the top-m heap entries; target <= 1.3x base cost)
  csub4     tile_csub=4 upload (2x larger per-item DMA transfers; the
            kernel runs at ~30% of HBM peak — is it DMA-granularity?)

Each rung reports recall@10, ms/batch, QPS, and a stop_after stage
budget for the winner. Writes BENCH_STAGE_r5.json (incremental,
appending to prior families' rows).

Usage: python -m seismic_tpu.harness.probe_r5b [family ...]
  families: grid grid2 knn 2pass b1 csub4   (default: all)
Run each family as its OWN process: accumulated executables' scratch
reservations OOMed the knn family after the 12-program grid family on
this 16GB chip (jax.clear_caches() between rungs helps but fresh
processes are the reliable boundary).
"""
from __future__ import annotations

import dataclasses
import faulthandler
import json
import os
import sys
import time

import numpy as np

faulthandler.dump_traceback_later(9000, exit=True)
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)

# headline bench config: 100K docs, narrowed V=512 topv tiles
os.environ.setdefault("BENCH_N_DOCS", "100000")
os.environ.setdefault("BENCH_N_QUERIES", "16384")


def _load_rows():
    path = os.path.join(ROOT, "BENCH_STAGE_r5.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f).get("rungs", [])
    return []


def _write(rows, meta):
    path = os.path.join(ROOT, "BENCH_STAGE_r5.json")
    art = {"note": (
        "round-5 headline throughput grid (probe_r5b): pool-mode/"
        "qloc-mode/score-cut/knn_top/csub levers at B=16384 M=16, "
        "100K docs, narrowed V=512 tiles. VERDICT r4 asks #4/#5."
    ), **meta, "rungs": rows}
    with open(path, "w") as f:
        json.dump(art, f, indent=1)


def main():
    import bench
    from bench import _sync, log, recall_at_k

    faulthandler.cancel_dump_traceback_later()
    faulthandler.dump_traceback_later(9000, exit=True)

    import jax
    import jax.numpy as jnp

    bench.enable_compile_cache()

    from seismic_tpu.ops.pallas_tiles import narrow_vocab
    from seismic_tpu.search import knn as knn_mod
    from seismic_tpu.search.grouped import (
        GroupedParams,
        plan_caps,
        search_grouped_derive_jit,
    )
    from seismic_tpu.search.planner import PlannerContext
    from seismic_tpu.types import KNN_SUFFIX, IndexArrays

    log("devices:", jax.devices())
    q_comps, q_vals = bench.get_queries(bench.DIM)
    with np.load(os.path.join(
            bench.CACHE,
            f"gt_{bench.N_DOCS}_{bench.DIM}_{len(q_comps)}.npz")) as z:
        gt_ids = z["ids"]

    base = os.path.join(
        bench.CACHE,
        f"index_{bench.N_DOCS}_{bench.DIM}_{bench.N_POSTINGS}"
        f"_v{bench.V_CAP}_o{bench.TILE_OVERFLOW}")
    nw = base + f"_nw{bench.NARROW_V}.dir"
    t0 = time.time()
    if os.path.isdir(nw):
        arrays = IndexArrays.load_dir(nw)
        arrays_dir = nw
    else:
        arrays = narrow_vocab(IndexArrays.load_dir(base + ".dir"),
                              bench.NARROW_V)
        arrays_dir = None
    for f in ("dense_summary", "dense_scale", "block_sketch",
              "block_sketch_scale", "doc_sketch", "doc_sketch_scale"):
        setattr(arrays, f, None)
    knn_path = base + ".knn16"
    knn_np = (knn_mod.load_knn(knn_path)
              if os.path.exists(knn_path + KNN_SUFFIX) else None)
    log(f"arrays loaded: {time.time()-t0:.1f}s  knn="
        f"{'yes' if knn_np is not None else 'no'}")

    fams = set(sys.argv[1:]) or {"grid", "grid2", "knn", "2pass", "b1",
                                 "csub4", "pdt", "m32", "seg"}
    B = 16384
    M = 16
    qn, vn = q_comps[:B], q_vals[:B]
    qd = jnp.asarray(qn, jnp.int32)
    vd = jnp.asarray(vn, jnp.float32)
    gt = gt_ids[:B]
    rows = _load_rows()
    done = {r.get("label") for r in rows}
    meta = {"B": B, "M": M, "narrow_v": bench.NARROW_V}

    def make_run(index, ctx, csub):
        caps = {}

        def run(gp, qcut, reps=4, label="", stage=False):
            if label in done:
                log(f"{label}: skipped (already measured)")
                return None, None
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
            row = {"label": label, "csub": csub,
                   "ms_per_batch": round(dt * 1e3, 2),
                   "qps": round(B / dt, 1),
                   "recall_at_10": round(rec, 4)}
            if stage:
                budget = {}
                for st in ("qloc", "expand", "kernel", "regroup",
                           "pool", "prerank"):
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
            _write(rows, meta)
            return dt, rec

        return run

    t0 = time.time()
    # aligned-layout disk cache: the random-order gather over the tile
    # pool is ~7-8 min of single-core host work at this shape; each
    # family runs as its own process (OOM isolation), so without the
    # cache every family repays it (round-5 session-3: 514s per family).
    aligned = None
    if arrays_dir is not None:
        from seismic_tpu.ops_pallas_prep import load_or_build_aligned
        aligned = load_or_build_aligned(arrays, arrays_dir, 2)
    index = arrays.to_device(pallas_tiles=True, tile_csub=2,
                             _aligned=aligned)
    ctx = PlannerContext.from_arrays(arrays, csub=2)
    _sync(index.doc_tiles_aligned)
    if knn_np is not None:
        index = dataclasses.replace(
            index, knn=jax.device_put(jnp.asarray(knn_np)))
    log(f"to_device(csub=2): {time.time()-t0:.1f}s")
    run = make_run(index, ctx, 2)

    gp_base = GroupedParams(k=10, score_cut=64, pool=96, rescore=64,
                            compute_dtype="i8", pool_mode="hier",
                            pool_per_pair=16, kernel_unroll=8)

    if "grid" in fams:
        # ---- base + stage budget ----
        run(gp_base, 13, label="base_hier_qc13_p96r64", stage=True)

        # ---- stride pool ----
        for sel in ("exact", "approx"):
            gp = dataclasses.replace(gp_base, pool_mode="stride",
                                     pool_per_pair=0, pool_stride=8,
                                     pool_select=sel)
            try:
                run(gp, 13, label=f"stride8_{sel}_qc13_p96r64")
            except Exception as e:  # noqa: BLE001
                log(f"stride/{sel}: FAILED {type(e).__name__}: {e}")

        # ---- rowmajor qloc ----
        try:
            gp = dataclasses.replace(gp_base, qloc_mode="rowmajor")
            run(gp, 13, label="rowmajor_qloc_qc13_p96r64")
        except Exception as e:  # noqa: BLE001
            log(f"rowmajor: FAILED {type(e).__name__}: {e}")

        # ---- score_cut=48 ----
        gp = dataclasses.replace(gp_base, score_cut=48)
        run(gp, 13, label="sc48_qc13_p96r64")

        # ---- dedup post ----
        gp = dataclasses.replace(gp_base, dedup_mode="post")
        run(gp, 13, label="ddpost_qc13_p96r64")

    if "grid2" in fams:
        # ---- follow-ups on the grid family's findings: ddpost was
        # -8ms at -0.08pt (one qc step below the bar), stride8 was
        # -12ms at -2.5pt (the windowed max conflates ADJACENT posting
        # rows = same-cluster docs; smaller windows lose less) ----
        gp = dataclasses.replace(gp_base, dedup_mode="post")
        run(gp, 14, label="ddpost_qc14_p96r64")
        for stride in (4, 2):
            gp = dataclasses.replace(gp_base, pool_mode="stride",
                                     pool_per_pair=0, pool_stride=stride,
                                     pool_select="exact")
            try:
                run(gp, 13, label=f"stride{stride}_exact_qc13_p96r64")
            except Exception as e:  # noqa: BLE001
                log(f"stride{stride}: FAILED {type(e).__name__}: {e}")
        gp = dataclasses.replace(gp_base, pool_mode="stride",
                                 pool_per_pair=0, pool_stride=4,
                                 pool_select="exact", dedup_mode="post")
        try:
            run(gp, 14, label="stride4_ddpost_qc14_p96r64")
        except Exception as e:  # noqa: BLE001
            log(f"stride4_ddpost: FAILED {type(e).__name__}: {e}")

    if "pdt" in fams:
        # ---- pool_dtype=bf16: the regrouped score wall + PartialReduce
        # in bf16 (the pool stage is 54ms of 173ms at this point — the
        # single biggest line; rescore stays exact) ----
        gp = dataclasses.replace(gp_base, pool_dtype="bf16")
        run(gp, 13, label="pdt_hier_qc13_p96r64", stage=True)
        gp = dataclasses.replace(gp_base, pool_dtype="bf16",
                                 dedup_mode="post")
        run(gp, 13, label="pdt_ddpost_qc13_p96r64")
        run(gp, 14, label="pdt_ddpost_qc14_p96r64")
        # pool_recall: approx_max_k's recall_target scales the
        # PartialReduce's per-tile keep count — a direct pool-stage cost
        # knob never TPU-measured (default 0.98; padding absorbs most of
        # the loss since valid rows are a minority of the padded wall)
        gp = dataclasses.replace(gp_base, pool_dtype="bf16",
                                 dedup_mode="post", pool_recall=0.9)
        run(gp, 14, label="pdt_ddpost_pr90_qc14_p96r64")

    if "seg" in fams:
        # ---- exact two-level segment pool (round-5 session-4): one max
        # reduce over the wall + top-`pool` SEGMENTS (provably contains
        # the exact top-pool rows) + a [B, pool*segw] final top_k —
        # replaces the 52ms full-wall PartialReduce (hier stage 1). ----
        for segw in (32, 128):
            gp = dataclasses.replace(gp_base, pool_mode="seg",
                                     pool_seg_width=segw,
                                     pool_dtype="bf16",
                                     dedup_mode="post")
            run(gp, 13, label=f"seg{segw}_pdt_ddpost_qc13_p96r64",
                stage=(segw == 32))
        # approx final selection (PartialReduce over the gathered rows
        # instead of the exact sort)
        gp = dataclasses.replace(gp_base, pool_mode="seg",
                                 pool_seg_width=32, pool_select="approx",
                                 pool_dtype="bf16", dedup_mode="post")
        run(gp, 13, label="seg32a_pdt_ddpost_qc13_p96r64")
        # the bar rung: qc14 recovers the ddpost 0.08pt
        gp = dataclasses.replace(gp_base, pool_mode="seg",
                                 pool_seg_width=32, pool_dtype="bf16",
                                 dedup_mode="post")
        run(gp, 14, label="seg32_pdt_ddpost_qc14_p96r64")
        # without ddpost (the qc13-compliant candidate)
        gp = dataclasses.replace(gp_base, pool_mode="seg",
                                 pool_seg_width=32, pool_dtype="bf16")
        run(gp, 13, label="seg32_pdt_qc13_p96r64")

    if "m32" in fams:
        # M=32 plan groups: M=8->16 bought +12% at B=16384 (hot lists'
        # tiles stream once per 16 members); does the trend continue, or
        # do 32-slot groups stop filling / blow the M-slot matmul tail?
        caps32 = plan_caps(qn, vn, ctx, 13, M=32)

        def run_m32(gp, qcut, label):
            if label in done:
                log(f"{label}: skipped (already measured)")
                return
            jax.clear_caches()
            gc, wc = caps32
            out = search_grouped_derive_jit(
                index, qd, vd, gp, qcut, 32, gc, wc, ctx.zero_region)
            _sync(out)
            t0 = time.time()
            for _ in range(4):
                out = search_grouped_derive_jit(
                    index, qd, vd, gp, qcut, 32, gc, wc, ctx.zero_region)
            _sync(out)
            dt = (time.time() - t0) / 4
            rec = recall_at_k(np.asarray(out[1]), gt)
            log(f"{label}: {dt*1e3:7.2f} ms  recall@10={rec:.4f} "
                f"QPS={B/dt:,.0f}")
            rows.append({"label": label, "csub": 2, "M": 32,
                         "ms_per_batch": round(dt * 1e3, 2),
                         "qps": round(B / dt, 1),
                         "recall_at_10": round(rec, 4)})
            _write(rows, meta)

        run_m32(gp_base, 13, "m32_hier_qc13_p96r64")
        run_m32(dataclasses.replace(gp_base, pool_dtype="bf16",
                                    dedup_mode="post"), 13,
                "m32_pdt_ddpost_qc13_p96r64")

    if "knn" in fams and knn_np is not None:
        # ---- knn_top economics (ask #5) ----
        # cheap knn_top rungs FIRST, the full-refine ktop=0 baseline LAST:
        # its k*n_knn-row rescore temps OOMed the 16GB chip at B=16384
        # (session-4 run), killing the whole family before any data
        # landed. Per-rung try/except so one OOM costs one rung.
        for qc, ktop in ((12, 4), (12, 2), (13, 4)):
            gp = dataclasses.replace(gp_base, n_knn=16, knn_top=ktop)
            try:
                run(gp, qc, label=f"knn16top{ktop}_qc{qc}_p96r64")
            except Exception as e:  # noqa: BLE001
                log(f"knn16top{ktop}_qc{qc}: FAILED {type(e).__name__}")
        # cheap-base + cheap-refine headline candidates: can qc12 +
        # top2/top4 refine beat the plain qc13 rung at >= 0.97?
        for qc, ktop in ((12, 2), (12, 4)):
            gp = dataclasses.replace(gp_base, n_knn=16, knn_top=ktop,
                                     dedup_mode="post")
            try:
                run(gp, qc, label=f"knn16top{ktop}_ddpost_qc{qc}_p96r64")
            except Exception as e:  # noqa: BLE001
                log(f"knn16top{ktop}_ddpost_qc{qc}: FAILED "
                    f"{type(e).__name__}")
        for qc, ktop in ((12, 0),):
            gp = dataclasses.replace(gp_base, n_knn=16, knn_top=ktop)
            try:
                run(gp, qc, label=f"knn16top{ktop}_qc{qc}_p96r64")
            except Exception as e:  # noqa: BLE001
                log(f"knn16top{ktop}_qc{qc}: FAILED {type(e).__name__}")

    # ---- two-pass adaptive at 100K (cheap pass 1 + deep pass 2 on the
    # flagged few %): can the adaptive driver beat the fixed headline? ----
    from seismic_tpu.search.twopass import (
        TwoPassParams,
        search_batch_twopass,
    )

    def run_tp(tp, label, reps=3):
        s, i, st = search_batch_twopass(index, ctx, qn, vn, tp)
        t0 = time.time()
        for _ in range(reps):
            s, i, st = search_batch_twopass(index, ctx, qn, vn, tp)
        dt = (time.time() - t0) / reps
        rec = recall_at_k(i, gt)
        log(f"{label}: {dt*1e3:7.2f} ms  recall@10={rec:.4f} "
            f"QPS={B/dt:,.0f} flagged={st['flagged']}")
        rows.append({"label": label, "csub": 2,
                     "ms_per_batch": round(dt * 1e3, 2),
                     "qps": round(B / dt, 1),
                     "recall_at_10": round(rec, 4),
                     "flagged": st["flagged"]})
        _write(rows, meta)

    if "2pass" in fams:
        p2_deep = dataclasses.replace(gp_base, pool=256, rescore=128)
        for qc1, pool1, r1_, eps in ((12, 48, 32, 0.05),
                                     (12, 48, 32, 0.1),
                                     (12, 64, 48, 0.05),
                                     (13, 64, 48, 0.05)):
            p1 = dataclasses.replace(gp_base, pool=pool1, rescore=r1_)
            tp = TwoPassParams(pass1=p1, pass2=p2_deep, query_cut1=qc1,
                               query_cut2=16, eps=0.0, eps_rel=eps,
                               b2_frac=0.125, b2_min=256, M=M)
            lbl = f"2pass_qc{qc1}_p{pool1}r{r1_}_eps{eps}"
            if lbl in done:
                log(f"{lbl}: skipped (already measured)")
                continue
            jax.clear_caches()
            try:
                run_tp(tp, lbl)
            except Exception as e:  # noqa: BLE001
                log(f"2pass qc{qc1}/eps{eps}: FAILED "
                    f"{type(e).__name__}: {e}")

    # ---- low-latency b1 (VERDICT r4 ask #6: device b1 p50 <= 0.4ms) ----
    # where does the 0.769ms go? stage budgets at B=1 are dispatch-bound,
    # so measure WHOLE-program variants instead: op-count reductions
    # (exact pool = one top_k, dedup_mode=post = no variadic sort, small
    # rescore) and a plan-upload variant (search_grouped_jit: host plan,
    # fewer device ops than the in-jit derivation).
    def run_b1(gp, qcut, label, reps=200):
        if f"b1_{label}" in done:
            log(f"b1_{label}: skipped (already measured)")
            return
        jax.clear_caches()
        q1 = qn[:1]
        v1 = vn[:1]
        q1d = jnp.asarray(q1, jnp.int32)
        v1d = jnp.asarray(v1, jnp.float32)
        gc, wc = plan_caps(q1, v1, ctx, qcut, M=8)
        out = search_grouped_derive_jit(
            index, q1d, v1d, gp, qcut, 8, gc, wc, ctx.zero_region)
        _sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = search_grouped_derive_jit(
                index, q1d, v1d, gp, qcut, 8, gc, wc, ctx.zero_region)
        _sync(out)
        dt = (time.time() - t0) / reps
        log(f"b1 {label}: {dt*1e3:.3f} ms/call (pipelined)")
        rows.append({"label": f"b1_{label}", "csub": 2,
                     "ms_per_call": round(dt * 1e3, 3)})
        _write(rows, meta)

    if "b1" in fams:
        run_b1(gp_base, 13, "base_hier")
        run_b1(dataclasses.replace(gp_base, pool_mode="exact",
                                   pool_per_pair=0), 13, "exactpool")
        run_b1(dataclasses.replace(gp_base, pool_mode="exact",
                                   pool_per_pair=0, dedup_mode="post",
                                   kernel_unroll=1), 13,
               "exact_ddpost_u1")
        run_b1(dataclasses.replace(gp_base, pool_mode="exact",
                                   pool_per_pair=0, dedup_mode="post",
                                   pool=48, rescore=32), 13,
               "exact_ddpost_p48r32")
        run_b1(dataclasses.replace(gp_base, pool_mode="seg",
                                   pool_seg_width=32, pool_dtype="bf16",
                                   dedup_mode="post"), 13,
               "seg32_pdt_ddpost")

    if "csub4" not in fams:
        log("wrote BENCH_STAGE_r5.json")
        return

    # ---- csub=4 upload (bigger DMA granularity) ----
    del index
    run = None
    import gc as _gc
    _gc.collect()
    try:
        t0 = time.time()
        index4 = arrays.to_device(pallas_tiles=True, tile_csub=4)
        ctx4 = PlannerContext.from_arrays(arrays, csub=4)
        _sync(index4.doc_tiles_aligned)
        log(f"to_device(csub=4): {time.time()-t0:.1f}s")
        run4 = make_run(index4, ctx4, 4)
        run4(gp_base, 13, label="csub4_hier_qc13_p96r64")
        gp = dataclasses.replace(gp_base, pool_mode="stride",
                                 pool_per_pair=0, pool_stride=8)
        run4(gp, 13, label="csub4_stride8_qc13_p96r64")
    except Exception as e:  # noqa: BLE001
        log(f"csub4: FAILED {type(e).__name__}: {e}")
    log("wrote BENCH_STAGE_r5.json")


if __name__ == "__main__":
    main()
