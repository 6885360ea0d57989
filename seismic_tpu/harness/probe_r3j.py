"""Round-3 probe J, one TPU session: the 8.8M-doc SINGLE-CHIP scale rung
(VERDICT r2 missing #1: the reference demonstrates accuracy@10 = 0.99 at
8.8M docs; this repo had no 8.8M rung at all).

Per-posting doc tiles are infeasible at this scale (~50-90 GB); the
block-summary configuration fits one v5e chip:

  forward (i16 comps twin + u8 values, lean_fwd)   ~5.2 GB
  postings + block geometry                        ~0.5 GB
  hashed [n_blocks, V] block tiles (aligned)       ~3-6 GB

Stages (all cached under .bench_cache/):
  1. ground truth on-device via the STREAMING exact search
     (search/exact.py::_exact_search_stream — the [B, 8.8M] score
     matrix would be 72 GB)
  2. block view (V from argv, default 512) + lean upload
  3. qc x pool ladder at B=2048: recall@10, QPS, device HBM bytes
  4. writes SCALE88_BENCH.json at the repo root

Usage: python -m seismic_tpu.harness.probe_r3j [V] [n_postings]
"""
from __future__ import annotations

import dataclasses
import faulthandler
import json
import os
import sys
import time

import numpy as np

faulthandler.dump_traceback_later(11000, exit=True)
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")

N_DOCS = int(os.environ.get("B88_N_DOCS", 8_800_000))
DIM = 30522
V = int(sys.argv[1]) if len(sys.argv) > 1 else 512
N_POSTINGS = int(sys.argv[2]) if len(sys.argv) > 2 else int(
    os.environ.get("B88_N_POSTINGS", 3500)
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_gt(q_comps, q_vals):
    path = os.path.join(CACHE, f"gt88_{N_DOCS}_{DIM}_{len(q_comps)}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["ids"]
    from ..data.sparse import CsrDataset
    from ..search.exact import exact_search

    t = time.time()
    with np.load(os.path.join(CACHE, f"docs88_{N_DOCS}_{DIM}.npz")) as z:
        ds = CsrDataset(z["offsets"], z["components"], z["values"], DIM)
    log(f"dataset loaded: {time.time()-t:.0f}s")
    t = time.time()
    _, ids = exact_search(ds, q_comps, q_vals, k=10, chunk=16384,
                          stream=True)
    log(f"streaming exact GT: {time.time()-t:.0f}s")
    np.savez(path, ids=ids)
    del ds
    return ids


def main():
    import jax
    import jax.numpy as jnp

    from ..ops.pallas_tiles import block_pool_arrays
    from ..search.grouped import (
        GroupedParams,
        plan_caps,
        search_grouped_derive_jit,
    )
    from ..search.planner import PlannerContext
    from ..types import IndexArrays

    log("devices:", jax.devices())

    def _sync(out):
        # f32 ACCUMULATOR (dtype=), never .astype(): a materialized f32
        # cast of the multi-GB aligned tiles is a 4x device copy (OOMed
        # the round-4 mem stage)
        x = [l for l in jax.tree.leaves(out) if hasattr(l, "shape")][0]
        np.asarray(jnp.sum(x, dtype=jnp.float32))
        return out

    qz = np.load(os.path.join(CACHE, f"queries88_{DIM}_2048.npz"))
    q_comps, q_vals = qz["q_comps"], qz["q_vals"]
    gt_ids = get_gt(q_comps, q_vals)

    base = os.path.join(CACHE, f"index88_{N_DOCS}_{DIM}_{N_POSTINGS}")
    t0 = time.time()
    # the 8.8M block view takes ~30 CPU-min to derive (narrow_vocab +
    # chunked summary decode over ~10M block rows); cache it mmap-able
    bvdir = base + f".blockview_v{V}.dir"
    hpath = bvdir + ".tile_hash"
    # fingerprint the SOURCE index so a rebuilt base invalidates the
    # derived view (advisor r4: path+V alone silently reuses stale views)
    src_fp = str(int(os.path.getmtime(base + ".dir")))
    cache_ok = False
    if os.path.isdir(bvdir) and os.path.exists(hpath):
        lines = open(hpath).read().split()
        cache_ok = len(lines) >= 2 and lines[1] == src_fp
        if not cache_ok:
            log(f"block view cache STALE (fp {lines[1:]} != {src_fp}); "
                "rebuilding")
    if cache_ok:
        bv = IndexArrays.load_dir(bvdir)
        bv.pack_bins = True  # in-memory flag, not serialized
        tile_hash = int(lines[0])
        log(f"block view mmap-loaded from cache: {time.time()-t0:.0f}s "
            f"rows={bv.doc_tiles.shape[0]:,}")
    else:
        arrays = IndexArrays.load_dir(base + ".dir")
        log(f"8.8M index mmap-loaded: {time.time()-t0:.0f}s")
        t0 = time.time()
        tile_hash = 0
        if arrays.dense_summary is not None:
            # DENSE block tiles (probe_r3p: exact-summary pool quality;
            # the hashed rows lose 3-7 points of block-pool recall)
            if V < arrays.dense_summary.shape[1]:
                from ..ops.pallas_tiles import narrow_vocab

                arrays = narrow_vocab(arrays, V)
            bv = block_pool_arrays(arrays, V, order_members=True,
                                   mode="dense", pack_bins=True)
        else:
            bv = block_pool_arrays(arrays, V, order_members=True,
                                   mode="hash", pack_bins=True)
            tile_hash = V
        log(f"block view V={V} (hash={bool(tile_hash)}): "
            f"{time.time()-t0:.0f}s rows={bv.doc_tiles.shape[0]:,}")
        for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
                  "summary_codes", "dense_summary", "dense_scale",
                  "block_sketch", "block_sketch_scale", "doc_sketch",
                  "doc_sketch_scale"):
            setattr(bv, f, None)
        del arrays
        t0 = time.time()
        bv.save_dir(bvdir)
        with open(hpath, "w") as f:
            f.write(f"{tile_hash} {src_fp}")
        log(f"block view cached: {time.time()-t0:.0f}s")
    E = int(bv.max_block_len)

    t0 = time.time()
    # csub=1 + bin-packed regions: the unpacked csub=2 layout OOMed at
    # 19.07G arguments vs 15.75G HBM (round-4 first attempt)
    index = bv.to_device(pallas_tiles=True, tile_csub=1,
                         tile_hash=tile_hash, lean_fwd=True)
    ctx = PlannerContext.from_arrays(bv, csub=1)
    _sync(index.doc_tiles_aligned)
    dev_b = int(sum(x.nbytes for x in jax.tree.leaves(index)
                    if hasattr(x, "nbytes")))
    log(f"to_device(8.8M block V={V})+ctx: {time.time()-t0:.0f}s "
        f"device={dev_b/1e9:.2f}GB")

    B = 2048
    recall = lambda ids: float(np.mean([  # noqa: E731
        len({int(x) for x in r[:10] if x >= 0}
            & {int(x) for x in g[:10] if x >= 0}) / 10.0
        for r, g in zip(ids, gt_ids[:B])
    ]))

    def run(gp, qcut, reps=5):
        qn, vn = q_comps[:B], q_vals[:B]
        qd = jnp.asarray(qn, jnp.int32)
        vd = jnp.asarray(vn, jnp.float32)
        gc, wc = plan_caps(qn, vn, ctx, qcut, M=8)
        out = search_grouped_derive_jit(
            index, qd, vd, gp, qcut, 8, gc, wc, ctx.zero_region)
        _sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = search_grouped_derive_jit(
                index, qd, vd, gp, qcut, 8, gc, wc, ctx.zero_region)
        _sync(out)
        dt = (time.time() - t0) / reps
        return dt, recall(np.asarray(out[1]))

    # rescore_chunk bounds the block_expand forward-gather temps: the
    # round-4 run OOMed every pool >= 64 (20-25 GB of XLA temps vs
    # 15.75 GB HBM) and the only surviving rung (pool=32) sat at
    # recall 0.40 — far too shallow for 8.8M docs
    basep = GroupedParams(k=10, score_cut=64, pool=32, block_expand=E,
                          compute_dtype="i8", pool_mode="hier",
                          pool_per_pair=8, kernel_unroll=8,
                          rescore_chunk=1024)
    results = []

    def flush():
        # incremental: a timeout mid-ladder still leaves the rungs run
        out = {
            "n_docs": N_DOCS, "dim": DIM, "n_postings": N_POSTINGS,
            "tile_mode": "block", "V": V, "batch": B,
            "device_bytes": dev_b,
            "note": (
                "8.8M-doc single-chip rung: bin-packed block-summary "
                "pooling + block_expand exact rescore; per-posting "
                "tiles are infeasible at this scale (>=50 GB). "
                "Reference bar: accuracy@10 0.99 on 8.8M MS MARCO "
                "(reference docs/Guidelines.md:41-67)."
            ),
            "rungs": results,
        }
        with open(os.path.join(ROOT, "SCALE88_BENCH.json"), "w") as f:
            json.dump(out, f, indent=1)

    # depth-first ladder: recall is pool-bound at this scale (qc only
    # moved it 0.40->0.404 in round 4), so climb pool depth at qc=10/14
    for qcut in (10, 14):
        for pool, ppp in ((64, 16), (128, 32), (256, 64), (512, 128)):
            gp = dataclasses.replace(basep, pool=pool, pool_per_pair=ppp)
            try:
                dt, rec = run(gp, qcut)
                log(f"e2e 8.8M block V{V} qc{qcut} p{pool}xE{E}: "
                    f"{dt*1e3:8.2f} ms  recall@10={rec:.4f} "
                    f"QPS={B/dt:,.0f}")
                results.append({
                    "qc": qcut, "pool": pool, "E": E,
                    "recall_at_10": round(rec, 4),
                    "qps": round(B / dt, 1),
                    "ms_per_batch": round(dt * 1e3, 2),
                })
                flush()
            except Exception as e:  # noqa: BLE001
                log(f"qc{qcut}/p{pool}: FAILED {type(e).__name__}: {e}")
    flush()
    log("wrote SCALE88_BENCH.json")


if __name__ == "__main__":
    main()
