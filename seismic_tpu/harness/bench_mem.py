"""Memory-parity bench rung (VERDICT round-1 item 3).

The tiles fast path replicates each document's dense local-vocab row per
posting occurrence (~24x the forward index at the bench config) — the
speed-for-memory trade. This rung measures the OTHER end of the trade: an
index with NO doc tiles at all, sized ~2x the forward index like the
reference's compressed configurations (reference README.md:110-115,
7.9 GB vs 24 GB; mem_budget_* best_configs):

- forward index stored u8 (DotVByte-equivalent per-doc scalar
  quantization, src/pylib/dotvbyte.rs)
- block ranking on the dense per-list u8 summaries (V=512)
- candidates gathered from the top blocks' postings, coarse-ranked by
  int8 CountSketch doc rows, exact-scored from forward rows
  (engine search_batch doc_mode="gather")

Writes MEM_BENCH.json: space report + QPS + recall vs the same GT.

Usage: python -m seismic_tpu.harness.bench_mem [--build-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
CACHE = os.path.join(ROOT, ".bench_cache")

N_DOCS = 100_000
DIM = 30522


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_mem_index():
    from ..build.builder import build_index
    from ..config import Configuration, GlobalThresholdPruning, TpuLayout
    from ..data.sparse import CsrDataset
    from ..types import IndexArrays

    path = os.path.join(CACHE, f"memindex_{N_DOCS}_{DIM}_200_v512.dir")
    if os.path.isdir(path):
        t = time.time()
        arrays = IndexArrays.load_dir(path)
        log(f"mem index loaded: {time.time()-t:.1f}s")
        return arrays
    dpath = os.path.join(CACHE, f"docs_{N_DOCS}_{DIM}.npz")
    with np.load(dpath) as z:
        ds = CsrDataset(z["offsets"], z["components"], z["values"], DIM)
    cfg = Configuration(
        pruning=GlobalThresholdPruning(n_postings=200, max_fraction=2.0),
        layout=TpuLayout(
            max_block_len=32, summary_vocab_cap=512, max_doc_nnz=256,
            tile_overflow=0,
        ),
    )
    t = time.time()
    arrays = build_index(
        ds, cfg, value_dtype="u8", store_doc_tiles=False,
        store_summaries=False, progress=True,
    )
    log(f"mem index build: {time.time()-t:.0f}s")
    arrays.save_dir(path)
    return arrays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    arrays = get_mem_index()
    space = arrays.space_usage_report()
    fwd = space["forward_index"]
    ratio = space["total"] / max(fwd, 1)
    log(f"space: total={space['total']/1e6:.0f}MB forward={fwd/1e6:.0f}MB "
        f"ratio={ratio:.2f}x")
    if args.build_only:
        print(json.dumps({"space": space, "ratio_vs_forward": ratio}))
        return

    import jax
    import jax.numpy as jnp

    from ..search.engine import SearchParams, pad_queries, search_batch_jit
    from ..harness.synth import synth_queries

    def _sync(out):
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

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    index = arrays.to_device()
    log(f"to_device: {time.time()-t0:.0f}s")
    qc_l, qv_l = synth_queries(1024, dim=DIM, seed=11)
    q_comps, q_vals = pad_queries(qc_l, qv_l, 64)
    gt = np.load(os.path.join(CACHE, f"gt_{N_DOCS}_{DIM}_1024.npz"))["ids"]
    B = args.batch
    qd = jnp.asarray(q_comps[:B], jnp.int32)
    vd = jnp.asarray(q_vals[:B], jnp.float32)

    rows = []
    for qc, bb, cb in [(10, 48, 0), (10, 96, 0), (12, 96, 0),
                       (14, 128, 0), (16, 160, 0)]:
        params = SearchParams(
            k=10, query_cut=qc, block_budget=bb, cand_budget=cb,
            block_mode="dense", doc_mode="rescore", dedup_pool=128,
        )
        out = _sync(search_batch_jit(index, qd, vd, jnp.float32(0.0),
                                     params, 128, 42))
        rec = recall_at_k(np.asarray(out[1])[:1024], gt)
        t0 = time.time()
        for _ in range(args.reps):
            out = search_batch_jit(index, qd, vd, jnp.float32(0.0),
                                   params, 128, 42)
        _sync(out)
        dt = (time.time() - t0) / args.reps
        row = {"query_cut": qc, "block_budget": bb, "cand_budget": cb,
               "qps": round(B / dt, 1), "ms_per_batch": round(dt * 1e3, 2),
               "recall_at_10": round(rec, 4)}
        log(str(row))
        rows.append(row)

    artifact = {
        "space": space,
        "ratio_vs_forward": round(ratio, 3),
        "note": (
            "no-doc-tiles u8-forward index (DotVByte-equivalent); block "
            "ranking on dense u8 summaries, every surviving block's "
            "candidates exact-scored by the Pallas rescore kernel "
            "(doc_mode=rescore); ratio_vs_forward is vs the u8 forward "
            "index — vs the f32 forward index (204.8 MB) the total is "
            "1.92x"
        ),
        "rungs": rows,
    }
    with open(os.path.join(ROOT, "MEM_BENCH.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
