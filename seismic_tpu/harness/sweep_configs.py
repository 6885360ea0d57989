"""On-device query-parameter sweep over the cached bench index, emitting
grid-style results + fastest-config-per-recall TOMLs
(experiments/best_configs_synth/), closing VERDICT round-1 item 8: the
reference ships ~40 tuned per-recall TOMLs
(reference: experiments/best_configs/msmarco-v1/splade-v3/mem_budget_1.5/);
this repo shipped only the generator.

The indexing configuration is the bench index's (one build); the sweep
covers the query-side knobs the perf CLI exposes (query-cut, n-knn,
batch-size). Results are written in the run_grid_search grid-root layout
(combo.json + report.tsv per combo) so harness/best_configs.py consumes
them unchanged.

Usage (on the TPU host):
  python -m seismic_tpu.harness.sweep_configs
  python -m seismic_tpu.harness.best_configs \
      --grid-root experiments/grid_synth \
      --base-toml experiments/best_configs_synth/base.toml \
      --recalls 0.95,0.96,0.97,0.98 \
      --output-dir experiments/best_configs_synth
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
CACHE = os.path.join(ROOT, ".bench_cache")

INDEXING = {
    # bench index build parameters, in build_inverted_index CLI terms
    "n-postings": 200,
    "max-fraction": 2.0,
    "max-block-len": 32,
    "summary-vocab-cap": 1024,
    "max-doc-nnz": 256,
    "value-type": "f32",
}


def _sync(out):
    import jax
    import jax.numpy as jnp

    x = [l for l in jax.tree.leaves(out) if hasattr(l, "shape")][0]
    np.asarray(jnp.sum(x, dtype=jnp.float32))
    return out


def recall_at_k(ids, gt_ids, k=10):
    hits = tot = 0
    for r, g in zip(ids, gt_ids):
        rs = {int(x) for x in r[:k] if x >= 0}
        gs = {int(x) for x in g[:k] if x >= 0}
        hits += len(rs & gs)
        tot += len(gs)
    return hits / max(tot, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default=os.path.join(
        CACHE, "index_100000_30522_200_v1024_o64.dir"))
    ap.add_argument("--gt", default=os.path.join(
        CACHE, "gt_100000_30522_2048.npz"))
    ap.add_argument("--grid-root", default=os.path.join(
        ROOT, "experiments", "grid_synth"))
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..search import knn as knn_mod
    from ..search.engine import pad_queries
    from ..search.grouped import (
        DevicePlan,
        GroupedParams,
        search_grouped_jit,
    )
    from ..search.planner import PlannerContext, plan_grouped
    from ..types import KNN_SUFFIX, IndexArrays
    from .synth import synth_queries

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    arrays = IndexArrays.load(args.index)
    space_total = arrays.space_usage_report()["total"]
    t0 = time.time()
    index = arrays.to_device(pallas_tiles=True, tile_csub=2)
    ctx = PlannerContext.from_arrays(arrays, csub=2)
    print(f"to_device: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    knn_path = args.index.rstrip("/").replace(".dir", ".knn16")
    index_knn = None
    if os.path.exists(knn_path + KNN_SUFFIX):
        graph = knn_mod.load_knn(knn_path)
        index_knn = dataclasses.replace(
            index, knn=jax.device_put(jnp.asarray(graph))
        )

    qc1, qv1 = synth_queries(1024, dim=arrays.dim, seed=11)
    q_comps, q_vals = pad_queries(qc1, qv1, 64)
    qc2, qv2 = synth_queries(1024, dim=arrays.dim, seed=12)
    e_comps, e_vals = pad_queries(qc2, qv2, 64)
    q_comps = np.concatenate([q_comps, e_comps])
    q_vals = np.concatenate([q_vals, e_vals])
    gt = np.load(args.gt)["ids"]

    B = min(args.batch, len(q_comps))
    qd = jnp.asarray(q_comps[:B], jnp.int32)
    vd = jnp.asarray(q_vals[:B], jnp.float32)

    os.makedirs(args.grid_root, exist_ok=True)
    combos = []
    for qc in (8, 10, 11, 12, 14, 16, 20):
        combos.append((qc, 0))
    if index_knn is not None:
        for qc in (10, 11, 12, 14, 16):
            combos.append((qc, 8))

    for qc, n_knn in combos:
        ix = index_knn if n_knn > 0 else index
        gp = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                           compute_dtype="i8", pool_mode="approx",
                           n_knn=n_knn)
        plan = plan_grouped(q_comps[:B], q_vals[:B], ctx, qc, M=8)
        dp = DevicePlan.put(plan)
        out = _sync(search_grouped_jit(ix, dp, qd, vd, gp))
        rec = recall_at_k(np.asarray(out[1]), gt[:B])
        # e2e timing: re-plan per rep (planning overlaps device work)
        t0 = time.time()
        for _ in range(args.reps):
            plan = plan_grouped(q_comps[:B], q_vals[:B], ctx, qc, M=8)
            dp = DevicePlan.put(plan)
            out = search_grouped_jit(ix, dp, qd, vd, gp)
        _sync(out)
        dt = (time.time() - t0) / args.reps
        us_per_query = dt * 1e6 / B
        combo = {
            "indexing": dict(INDEXING),
            "query": {
                "query-cut": qc,
                "heap-factor": 0.0,
                "n-knn": n_knn,
                "batch-size": B,
                "full-lists": True,
            },
        }
        h = hashlib.sha1(
            json.dumps(combo, sort_keys=True).encode()
        ).hexdigest()[:16]
        d = os.path.join(args.grid_root, h)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "combo.json"), "w") as f:
            json.dump({"combo": combo}, f, indent=1)
        with open(os.path.join(d, "report.tsv"), "w") as f:
            f.write("accuracy\tus_per_query\ttotal_bytes\n")
            f.write(f"{rec:.4f}\t{us_per_query:.2f}\t{space_total}\n")
        print(f"qc={qc:2d} n_knn={n_knn:2d}: {us_per_query:7.2f} us/q "
              f"({B/dt:6.0f} QPS) recall={rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
