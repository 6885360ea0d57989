#!/usr/bin/env python
"""Headline benchmark: batched QPS/chip at recall@10 >= 0.97 on a synthetic
MS MARCO/SPLADE-shaped collection (BASELINE.json north star).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": QPS / 5405}

vs_baseline is relative to the reference's single-thread CPU average query
time of 185 us/query (~5405 QPS) on MS MARCO SPLADE-v3 (reference
README.md:110-115); the driver's target is >= 50x.

The index build (NumPy k-means at this scale) is cached under .bench_cache/
so repeated runs only measure the query path. All progress goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")

# ---- benchmark protocol constants ----
N_DOCS = int(os.environ.get("BENCH_N_DOCS", 100_000))
DIM = 30522
N_QUERIES = 1024
K = 10
BATCH = int(os.environ.get("BENCH_BATCH", 1024))
TARGET_RECALL = 0.97
N_POSTINGS = int(os.environ.get("BENCH_N_POSTINGS", 200))
BASELINE_QPS = 1e6 / 185.0  # reference single-thread CPU AQT
V_CAP = int(os.environ.get("BENCH_V_CAP", 1024))
TILE_OVERFLOW = int(os.environ.get("BENCH_TILE_OVERFLOW", 64))

# (query_cut, heap_factor, full_lists, block_budget): accuracy ladder for
# the tiles mode (full_lists ignores hf/budget and scans selected lists)
LADDER = [
    (10, 0.0, True, 0),
    (11, 0.0, True, 0),
    (12, 0.0, True, 0),
    (14, 0.0, True, 0),
    (16, 0.0, True, 0),
    (20, 0.0, True, 0),
    (30, 0.0, True, 0),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_dataset():
    from seismic_tpu.data import io as data_io
    from seismic_tpu.harness.synth import synth_dataset

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"docs_{N_DOCS}_{DIM}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            from seismic_tpu.data.sparse import CsrDataset

            return CsrDataset(z["offsets"], z["components"], z["values"], DIM)
    t = time.time()
    ds = synth_dataset(N_DOCS, dim=DIM, seed=7)
    np.savez(
        path,
        offsets=ds.offsets,
        components=ds.components,
        values=ds.values,
    )
    log(f"synth dataset: {time.time()-t:.1f}s, nnz={ds.nnz}")
    return ds


def get_index(ds):
    from seismic_tpu.config import (
        Configuration,
        GlobalThresholdPruning,
        TpuLayout,
    )
    from seismic_tpu.types import IndexArrays

    path = os.path.join(
        CACHE, f"index_{N_DOCS}_{DIM}_{N_POSTINGS}_v{V_CAP}_o{TILE_OVERFLOW}"
    )
    full = path + ".index.seismic_tpu"
    if os.path.exists(full):
        t = time.time()
        arrays = IndexArrays.load(full)
        log(f"index loaded from cache: {time.time()-t:.1f}s")
        return arrays
    from seismic_tpu.build.builder import build_index

    cfg = Configuration(
        pruning=GlobalThresholdPruning(n_postings=N_POSTINGS,
                                       max_fraction=2.0),
        layout=TpuLayout(
            max_block_len=32, summary_vocab_cap=V_CAP, max_doc_nnz=256,
            tile_overflow=TILE_OVERFLOW,
        ),
    )
    t = time.time()
    arrays = build_index(ds, cfg, value_dtype="f32", progress=True)
    build_secs = time.time() - t
    log(f"index build: {build_secs:.1f}s")
    arrays.save(path)
    with open(path + ".buildtime.json", "w") as f:
        json.dump({"build_secs": build_secs}, f)
    return arrays


def get_ground_truth(ds, q_comps, q_vals):
    path = os.path.join(CACHE, f"gt_{N_DOCS}_{DIM}_{N_QUERIES}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["ids"]
    from seismic_tpu.search.exact import exact_search

    t = time.time()
    _, ids = exact_search(ds, q_comps, q_vals, k=K, chunk=2048)
    log(f"exact ground truth: {time.time()-t:.1f}s")
    np.savez(path, ids=ids)
    return ids


def recall_at_k(ids, gt_ids):
    hits = tot = 0
    for r, g in zip(ids, gt_ids):
        rs = {int(x) for x in r[:K] if x >= 0}
        gs = {int(x) for x in g[:K] if x >= 0}
        hits += len(rs & gs)
        tot += len(gs)
    return hits / max(tot, 1)


def main():
    t_all = time.time()
    import jax

    log(f"devices: {jax.devices()}")
    from seismic_tpu.search.engine import (
        SearchParams,
        pad_queries,
        search_batch_jit,
    )
    from seismic_tpu.harness.synth import synth_queries
    import jax.numpy as jnp

    ds = get_dataset()
    arrays = get_index(ds)
    qc, qv = synth_queries(N_QUERIES, dim=DIM, seed=11)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    gt_ids = get_ground_truth(ds, q_comps, q_vals)

    index = arrays.to_device(pallas_tiles=True)
    layout = arrays.config.layout
    n_batches = N_QUERIES // BATCH
    qc_dev = [
        jnp.asarray(q_comps[i * BATCH : (i + 1) * BATCH], jnp.int32)
        for i in range(n_batches)
    ]
    qv_dev = [
        jnp.asarray(q_vals[i * BATCH : (i + 1) * BATCH], jnp.float32)
        for i in range(n_batches)
    ]

    rungs = []
    for query_cut, hf, full_lists, budget in LADDER:
        params = SearchParams(
            k=K, query_cut=query_cut, block_budget=budget,
            block_mode="dense", doc_mode="tiles", full_lists=full_lists,
            score_cut=64, dedup_pool=128, use_pallas=True,
        )
        outs = []
        for b in range(n_batches):
            s, i = search_batch_jit(
                index, qc_dev[b], qv_dev[b], jnp.float32(hf), params,
                layout.sketch_dim, layout.sketch_seed,
            )
            outs.append(np.asarray(i))
        rec = recall_at_k(np.concatenate(outs), gt_ids)
        log(f"qc={query_cut} hf={hf} full={full_lists} budget={budget}: "
            f"recall@10={rec:.4f}")
        rungs.append((params, hf, rec))
        if rec >= TARGET_RECALL:
            break

    # cheapest rung achieving >= min(target, best - 0.003)
    best = max(r[2] for r in rungs)
    need = min(TARGET_RECALL, best - 0.003)
    params, hf, rec = next(r for r in rungs if r[2] >= need)
    # ---- timed runs ----
    hf_dev = jnp.float32(hf)

    def run_all():
        res = None
        for b in range(n_batches):
            res = search_batch_jit(
                index, qc_dev[b], qv_dev[b], hf_dev, params,
                layout.sketch_dim, layout.sketch_seed,
            )
        # force real completion (axon's block_until_ready is async)
        np.asarray(res[0]).ravel()[:1]

    run_all()  # warmup (compiled already, but fill caches)
    reps = 10
    # p50 batch latency: synced per batch
    batch_times = []
    for _ in range(3):
        tb = time.time()
        run_all()
        batch_times.append((time.time() - tb) / n_batches)
    p50_batch_ms = float(np.median(batch_times) * 1e3)
    # throughput: keep the device queue full, sync once
    t0 = time.time()
    res = None
    for _ in range(reps):
        for b in range(n_batches):
            res = search_batch_jit(
                index, qc_dev[b], qv_dev[b], hf_dev, params,
                layout.sketch_dim, layout.sketch_seed,
            )
    np.asarray(res[0]).ravel()[:1]
    elapsed = time.time() - t0
    qps = (reps * N_QUERIES) / elapsed

    log(
        f"QPS={qps:.0f} recall@10={rec:.4f} p50_batch={p50_batch_ms:.2f}ms "
        f"(batch={BATCH}) total_bench_time={time.time()-t_all:.0f}s"
    )
    result = {
        "metric": (
            f"batched QPS/chip at recall@10>={rec:.3f} "
            f"(synthetic SPLADE, {N_DOCS} docs, dim {DIM}, k={K}, "
            f"qc={params.query_cut}, tiles mode, "
            f"full_lists={params.full_lists})"
        ),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
