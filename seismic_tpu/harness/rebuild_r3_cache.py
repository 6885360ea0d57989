"""Rebuild the .bench_cache artifacts for the round-3 probe queue.

A VM reset wipes .bench_cache/ (dataset npz, built index dirs, ground
truth, hashed-tile dirs, kNN graphs); every r3 probe assumes they exist.
This stage recreates them idempotently so the queue can run unattended:

  100k scale: docs_100000 npz, index_100000_..._v1024_o64.dir (C++ build
      core), 16384-query GT (TPU exact search), the 1024-query GT subset
      (bench_knn's file), the hash1024 retile dir, and the knn16 graph.
  1m scale:   same artifacts at BENCH_N_DOCS=1000000 / n_postings=400 /
      tile_overflow=0 (the SCALE_BENCH build recipe).

Usage: python -m seismic_tpu.harness.rebuild_r3_cache [100k|1m]
"""
from __future__ import annotations

import faulthandler
import os
import sys
import time

import numpy as np

faulthandler.dump_traceback_later(7000, exit=True)
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)

SCALE = sys.argv[1] if len(sys.argv) > 1 else "100k"
if SCALE == "1m":
    os.environ["BENCH_N_DOCS"] = "1000000"
    os.environ["BENCH_N_QUERIES"] = "2048"
    os.environ["BENCH_BATCH"] = "2048"
    os.environ["BENCH_N_POSTINGS"] = "400"
    os.environ["BENCH_TILE_OVERFLOW"] = "0"


def main():
    # CPU_ONLY=1: run only the numpy/C++ phases (synth, index build,
    # narrow_vocab dirs) and skip the TPU ones (exact-search GT, knn) —
    # lets the 1M build overlap a TPU measurement stage on this 1-core
    # host without two TPU clients contending on the axon tunnel.
    cpu_only = os.environ.get("R3_CACHE_CPU_ONLY") == "1"
    if cpu_only:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import bench
    from bench import log

    # bench.py arms its own 3300s compile-hang watchdog at import, which
    # REPLACES the 7000s one above — the 100k rebuild takes ~55 min of
    # pure CPU build on this 1-core host, so the short timer killed the
    # 2026-08-18 run mid-save. Re-arm the long timer after the import.
    faulthandler.cancel_dump_traceback_later()
    faulthandler.dump_traceback_later(20000, exit=True)

    log(f"=== rebuild_r3_cache scale={SCALE} cpu_only={cpu_only} ===")
    ds = bench.get_dataset()
    arrays, base = bench.get_index(ds)
    q_comps, q_vals = bench.get_queries(bench.DIM)
    if not cpu_only:
        bench.get_ground_truth(ds, q_comps, q_vals)

    # bench_knn reads a 1024-query GT file; its queries are seed=11 =
    # the first 1024 of the bench protocol's query stream, so the subset
    # of the big GT is exact.
    gt_big = os.path.join(
        bench.CACHE, f"gt_{bench.N_DOCS}_{bench.DIM}_{len(q_comps)}.npz")
    gt_small = os.path.join(
        bench.CACHE, f"gt_{bench.N_DOCS}_{bench.DIM}_1024.npz")
    if not os.path.exists(gt_small) and os.path.exists(gt_big):
        with np.load(gt_big) as z:
            np.savez(gt_small, ids=z["ids"][:1024])
        log(f"wrote {gt_small} (subset of the {len(q_comps)}-query GT)")
    del ds

    # The hashed-tile family is DEAD (probe_r3g/l/m: sketch noise swamps
    # SPLADE dot margins; Roadmap "sketch family is dead") — no hash dir.
    # What probe_r3o needs instead: narrowed truncated-vocab tile dirs
    # derived from the v1024 build (half/three-quarter kernel width).
    from seismic_tpu.ops.pallas_tiles import narrow_vocab

    for W in (512, 768) if SCALE == "100k" else (512,):
        ndir = base + f"_nw{W}.dir"
        if not os.path.isdir(ndir):
            t0 = time.time()
            narrow_vocab(arrays, W).save_dir(ndir)
            log(f"narrow_vocab V0={W} + save: "
                f"{time.time()-t0:.1f}s -> {ndir}")

    knn_path = base + ".knn16"
    from seismic_tpu.types import KNN_SUFFIX

    if not cpu_only and not os.path.exists(knn_path + KNN_SUFFIX):
        from seismic_tpu.search import knn as knn_mod

        t0 = time.time()
        # engine tiles path (used by build_knn's self-search) needs the
        # csub=1 aligned layout — csub>1 uploads serve the grouped path
        index = arrays.to_device(pallas_tiles=True)
        arrays.knn = knn_mod.build_knn(arrays, index, 16, batch_size=1024)
        knn_mod.save_knn(arrays.knn, knn_path)
        log(f"knn16 build + save: {time.time()-t0:.0f}s -> {knn_path}")
    log(f"=== rebuild_r3_cache scale={SCALE}: done ===")


if __name__ == "__main__":
    main()
