"""k-NN refinement bench rung (VERDICT round-1 item 4).

Builds (once, cached) the bench index's k-NN graph by batched self-search,
then measures the grouped path with n_knn refinement: recall should push
past the reachability ceiling of the plain qc ladder (qc=11 tiles ceiling
~0.979) at far better QPS than qc=20/30 rungs.

Reference parity: Knn::new (inverted_index.rs:448-500) builds with
k=nknn+1, qc=10, hf=0.7; Knn::refine (551-593) re-scores each top-k hit's
neighbors. Here refinement = one wide-row gather of [B, k*n_knn] neighbor
ids + one exact-rescore kernel round (ops/pallas_rescore.py).

Usage: python -m seismic_tpu.harness.bench_knn [--nknn 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
CACHE = os.path.join(ROOT, ".bench_cache")


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
        CACHE, "gt_100000_30522_1024.npz"))
    ap.add_argument("--nknn", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

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
    from ..types import IndexArrays
    from .synth import synth_queries

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    arrays = IndexArrays.load(args.index)
    knn_path = args.index.rstrip("/").replace(".dir", f".knn{args.nknn}")

    t0 = time.time()
    index = arrays.to_device(pallas_tiles=True)
    ctx = PlannerContext.from_arrays(arrays)
    print(f"to_device: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    from ..types import KNN_SUFFIX

    if os.path.exists(knn_path + KNN_SUFFIX):
        arrays.knn = knn_mod.load_knn(knn_path)
        print(f"knn graph loaded from cache ({arrays.knn.shape})",
              file=sys.stderr, flush=True)
    else:
        t0 = time.time()
        arrays.knn = knn_mod.build_knn(arrays, index, args.nknn,
                                       batch_size=1024)
        print(f"knn build ({args.nknn} neighbors): {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
        knn_mod.save_knn(arrays.knn, knn_path)
    # attach the graph to the already-uploaded index (no 5 GB re-upload)
    import dataclasses

    index = dataclasses.replace(
        index, knn=jax.device_put(jnp.asarray(arrays.knn))
    )

    qc_l, qv_l = synth_queries(1024, dim=arrays.dim, seed=11)
    q_comps_np, q_vals_np = pad_queries(qc_l, qv_l, 64)
    gt = np.load(args.gt)["ids"]
    qd = jnp.asarray(q_comps_np, jnp.int32)
    vd = jnp.asarray(q_vals_np, jnp.float32)

    for qc, n_knn in [(11, 0), (11, 4), (11, 8), (11, 16), (8, 8),
                      (14, 8), (16, 0), (20, 0)]:
        if n_knn > args.nknn:
            continue
        gp = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                           compute_dtype="i8", n_knn=n_knn)
        plan = plan_grouped(q_comps_np, q_vals_np, ctx, qc, M=8)
        dp = DevicePlan.put(plan)
        out = _sync(search_grouped_jit(index, dp, qd, vd, gp))
        r = recall_at_k(np.asarray(out[1]), gt)
        t0 = time.time()
        for _ in range(args.reps):
            out = search_grouped_jit(index, dp, qd, vd, gp)
        _sync(out)
        dt = (time.time() - t0) / args.reps
        print(f"qc={qc:2d} n_knn={n_knn:2d}: {dt*1e3:7.2f} ms/batch -> "
              f"{1024/dt:6.0f} QPS  recall@10={r:.4f}", flush=True)


if __name__ == "__main__":
    main()
