"""Sharded-index scaling bench on the virtual CPU mesh: fixed collection,
1/2/4/8 document shards, per-shard-count build + query timing, plus a
save/load lifecycle check. Writes a JSON artifact.

Caveat recorded in the artifact: the virtual 8-device CPU mesh timeshares
the host's physical cores (this box has one), so wall-clock does NOT show
real multi-chip speedup — the artifact validates correctness, lifecycle,
and per-shard work division (streamed postings per shard), which is what
transfers to a real ICI-connected pod.

Usage: python -m seismic_tpu.harness.bench_sharded [--n-docs 20000]

`--grouped` instead runs the GROUPED (Pallas fast-path) sharded rungs —
tiles and block-summary modes, (docs-only and data x docs) meshes — at a
smaller default scale (Pallas interprets off-TPU, so wall-clock is
meaningless; the artifact records recall + shard work division) and
merges a "grouped" section into the existing SHARDED_BENCH.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=20000)
    ap.add_argument("--dim", type=int, default=30522)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--qc", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(ROOT, "SHARDED_BENCH.json"))
    ap.add_argument("--grouped", action="store_true",
                    help="grouped fast-path rungs (tiles + block modes)")
    ap.add_argument("--rungs", default="",
                    help="comma-separated rung label substrings to run "
                         "(grouped mode); default all")
    args = ap.parse_args()
    if args.grouped and args.n_docs == 20000:
        args.n_docs = 8192
        args.batch = 32

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ..config import Configuration, GlobalThresholdPruning, TpuLayout
    from ..parallel.mesh import make_mesh
    from ..parallel.sharded import ShardedIndex
    from ..search.engine import SearchParams, pad_queries
    from ..search.exact import exact_search
    from .synth import synth_dataset, synth_queries

    print(f"devices: {len(jax.devices())}", file=sys.stderr)
    t0 = time.time()
    ds = synth_dataset(args.n_docs, dim=args.dim, seed=7)
    qc_l, qv_l = synth_queries(args.batch, dim=args.dim, seed=11)
    q_comps, q_vals = pad_queries(qc_l, qv_l, 64)
    print(f"data: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    _, gt_ids = exact_search(ds, q_comps, q_vals, k=10, chunk=2048)
    print(f"gt: {time.time()-t0:.1f}s", file=sys.stderr)

    cfg = Configuration(
        pruning=GlobalThresholdPruning(n_postings=200, max_fraction=2.0),
        layout=TpuLayout(max_block_len=32, summary_vocab_cap=512,
                         max_doc_nnz=256, tile_overflow=32),
    )
    params = SearchParams(
        k=10, query_cut=args.qc, block_budget=0, block_mode="dense",
        doc_mode="tiles", full_lists=True, score_cut=64, dedup_pool=128,
    )

    def recall(ids):
        hits = tot = 0
        for r, g in zip(ids, gt_ids):
            rs = {int(x) for x in r[:10] if x >= 0}
            gs = {int(x) for x in g[:10] if x >= 0}
            hits += len(rs & gs)
            tot += len(gs)
        return hits / max(tot, 1)

    if args.grouped:
        from ..search.grouped import GroupedParams

        def write_grouped(rungs):
            # incremental merge-write: a killed run (CPU-mesh compiles are
            # ~40 min/rung on this 1-core host) keeps its finished rungs
            artifact = {}
            if os.path.exists(args.out):
                with open(args.out) as f:
                    artifact = json.load(f)
            prev = {
                r["rung"]: r
                for r in artifact.get("grouped", {}).get("rungs", [])
            }
            for r in rungs:
                prev[r["rung"]] = r
            artifact["grouped"] = {
                "n_docs": args.n_docs,
                "batch": args.batch,
                "note": (
                    "grouped Pallas fast path over the sharded SPMD "
                    "program (interpret mode off-TPU: recall + work "
                    "division only)"
                ),
                "rungs": list(prev.values()),
            }
            with open(args.out, "w") as f:
                json.dump(artifact, f, indent=1)
            return artifact

        rungs = []
        want = [s for s in args.rungs.split(",") if s]
        E = int(cfg.layout.max_block_len)

        # PRODUCTION recipe (VERDICT r4 #7: the round-2 artifact predates
        # the grouped path bench.py actually serves): i8 MXU kernel,
        # hier pool, unrolled item-major output, exact rescore — the same
        # GroupedParams class bench.py's headline uses, at probe scale.
        gp_tiles = GroupedParams(k=10, score_cut=64, pool=96, rescore=64,
                                 compute_dtype="i8", pool_mode="hier",
                                 pool_per_pair=16, kernel_unroll=8)
        gp_block = GroupedParams(k=10, score_cut=64, pool=32,
                                 block_expand=E, compute_dtype="i8",
                                 pool_mode="hier", pool_per_pair=8,
                                 kernel_unroll=8)

        # single-index reference run with the SAME recipe: the merge
        # correctness bar for every sharded rung (deterministic
        # (score, global-id) tie-breaks make ids comparable directly)
        ref_ids = {}

        def single_ref(tile_block):
            key = "block" if tile_block else "tiles"
            if key in ref_ids:
                return ref_ids[key]
            from ..build.builder import build_index
            from ..search.grouped import plan_caps, \
                search_grouped_derive_jit
            from ..search.planner import PlannerContext

            import jax.numpy as jnp

            arrays = build_index(ds, cfg)
            if tile_block:
                from ..ops.pallas_tiles import block_pool_arrays
                arrays = block_pool_arrays(
                    arrays, cfg.layout.summary_vocab_cap,
                    order_members=True, mode="dense")
            ix = arrays.to_device(pallas_tiles=True, tile_csub=1)
            ctx = PlannerContext.from_arrays(arrays, csub=1)
            gp = gp_block if tile_block else gp_tiles
            gc_, wc_ = plan_caps(q_comps, q_vals, ctx, args.qc, M=8)
            _, ids = search_grouped_derive_jit(
                ix, jnp.asarray(q_comps, jnp.int32),
                jnp.asarray(q_vals, jnp.float32), gp, args.qc, 8,
                gc_, wc_, ctx.zero_region)
            ref_ids[key] = np.asarray(ids)
            return ref_ids[key]

        for label, n_data, n_docs_sh, tile_block in (
            ("tiles d1xs2", 1, 2, 0),
            ("tiles d2xs4", 2, 4, 0),
            ("block d2xs4", 2, 4, 256),
            ("tiles d1xs8", 1, 8, 0),
        ):
            if want and not any(w in label for w in want):
                continue
            mesh = make_mesh(n_docs_shards=n_docs_sh, n_data=n_data)
            t0 = time.time()
            sharded = ShardedIndex.build(
                ds, mesh, cfg, pallas_tiles=True, tile_block=tile_block)
            t_build = time.time() - t0
            gp = gp_block if tile_block else gp_tiles
            t0 = time.time()
            _, ids = sharded.search_batch_grouped(
                q_comps, q_vals, gp, query_cut=args.qc)
            t_compile = time.time() - t0
            ids = np.asarray(ids)
            # merge correctness: fraction of result slots agreeing with
            # the single-index run of the SAME recipe. Shard-local pools
            # admit deeper per-shard candidates than one global pool, so
            # agreement is top-k-set-based, not positional.
            ref = single_ref(tile_block)
            agree = float(np.mean([
                len({int(x) for x in a[:10] if x >= 0}
                    & {int(x) for x in b[:10] if x >= 0}) / 10.0
                for a, b in zip(ids, ref)
            ]))
            row = {
                "rung": label,
                "mesh": {"data": n_data, "docs": n_docs_sh},
                "recipe": "i8-hier-unroll8" + (
                    "-blockexpand" if tile_block else "-rescore"),
                "build_s": round(t_build, 2),
                "compile_s": round(t_compile, 2),
                "recall_at_10": round(recall(ids), 4),
                "single_index_recall_at_10": round(recall(ref), 4),
                "merge_agreement_at_10": round(agree, 4),
                "postings_per_shard": [
                    int(s.list_len.sum()) for s in sharded.host_shards
                ],
            }
            print(row, file=sys.stderr)
            rungs.append(row)
            write_grouped(rungs)
        artifact = write_grouped(rungs)
        print(json.dumps(artifact["grouped"]))
        return

    results = []
    for n_shards in (1, 2, 4, 8):
        mesh = make_mesh(n_docs_shards=n_shards, n_data=1)
        t0 = time.time()
        sharded = ShardedIndex.build(ds, mesh, cfg)
        t_build = time.time() - t0
        # warmup + compile
        t0 = time.time()
        scores, ids = sharded.search_batch(q_comps, q_vals, params,
                                           heap_factor=0.0)
        t_compile = time.time() - t0
        rec = recall(ids)
        t0 = time.time()
        for _ in range(args.reps):
            scores, ids = sharded.search_batch(q_comps, q_vals, params,
                                               heap_factor=0.0)
        t_query = (time.time() - t0) / args.reps
        postings_per_shard = [
            int(s.list_len.sum()) for s in sharded.host_shards
        ]
        row = {
            "n_shards": n_shards,
            "build_s": round(t_build, 2),
            "compile_s": round(t_compile, 2),
            "query_ms_per_batch": round(t_query * 1e3, 2),
            "recall_at_10": round(rec, 4),
            "postings_per_shard": postings_per_shard,
        }
        print(row, file=sys.stderr)
        results.append(row)

    # lifecycle: save/load at 4 shards, verify identical results
    mesh = make_mesh(n_docs_shards=4, n_data=1)
    sharded = ShardedIndex.build(ds, mesh, cfg)
    s0, i0 = sharded.search_batch(q_comps, q_vals, params, heap_factor=0.0)
    path = os.path.join(ROOT, ".bench_cache", "sharded_lifecycle")
    t0 = time.time()
    sharded.save(path)
    t_save = time.time() - t0
    t0 = time.time()
    loaded = ShardedIndex.load(path, mesh)
    t_load = time.time() - t0
    s1, i1 = loaded.search_batch(q_comps, q_vals, params, heap_factor=0.0)
    roundtrip_ok = bool(np.array_equal(i0, i1) and np.allclose(s0, s1))

    artifact = {
        "n_docs": args.n_docs,
        "dim": args.dim,
        "batch": args.batch,
        "query_cut": args.qc,
        "note": (
            "virtual 8-device CPU mesh on a 1-core host: wall-clock does "
            "not reflect ICI-pod speedup; validates correctness, shard "
            "work division, and save/load lifecycle"
        ),
        "scaling": results,
        "lifecycle": {
            "save_s": round(t_save, 2),
            "load_s": round(t_load, 2),
            "roundtrip_identical": roundtrip_ok,
        },
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
