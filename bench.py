#!/usr/bin/env python
"""Headline benchmark: batched QPS/chip at recall@10 >= 0.97 on a synthetic
MS MARCO/SPLADE-shaped collection (BASELINE.json north star).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": QPS / 5405,
   "p50_ms": {...}, "recall_at_10": ..., "streamed_kb_per_query": ...,
   "knn_rung": ..., "pallas_gate": ...}

vs_baseline is relative to the reference's single-thread CPU average query
time of 185 us/query (~5405 QPS) on MS MARCO SPLADE-v3 (reference
README.md:110-115); the driver's target is >= 50x.

The measured path is the grouped (list-major) search, round-2 final form:
the plan (grouping of the batch's (query, list) pairs by posting list)
is DERIVED ON DEVICE inside the jit program (sorts + scans + scatters);
the host's native planner supplies only the static capacities and runs
overlapped with the previous batch. The int8 MXU Pallas kernel streams
each list's doc tiles once per group in [csub*128, V] super-blocks;
approx_max_k pools candidates; the exact-rescore kernel restores exact
forward-index scores for the top pool (search/grouped.py,
ops/pallas_grouped.py, ops/pallas_rescore.py).

The index build is cached under .bench_cache/ (directory format, mmap) so
repeated runs only measure the query path. All progress goes to stderr.
"""

import faulthandler
import json
import os
import sys
import time

import numpy as np

# watchdog: the axon platform occasionally wedges a compile; dump + die
# rather than hang the driver forever
faulthandler.dump_traceback_later(3300, exit=True)

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")

# ---- benchmark protocol constants ----
N_DOCS = int(os.environ.get("BENCH_N_DOCS", 100_000))
DIM = 30522
N_QUERIES = int(os.environ.get("BENCH_N_QUERIES", 16384))
K = 10
BATCH = int(os.environ.get("BENCH_BATCH", 4096))
TARGET_RECALL = 0.97
N_POSTINGS = int(os.environ.get("BENCH_N_POSTINGS", 200))
BASELINE_QPS = 1e6 / 185.0  # reference single-thread CPU AQT
V_CAP = int(os.environ.get("BENCH_V_CAP", 1024))
TILE_OVERFLOW = int(os.environ.get("BENCH_TILE_OVERFLOW", 64))
CSUB = int(os.environ.get("BENCH_CSUB", 2))
# "hash" = collision-summed mod-V doc tiles + per-query projection
# (ops/pallas_tiles.py::hash_retile); "topv" = truncated local vocab;
# "block" = memory-lean block-summary pooling (block_pool_arrays +
# GroupedParams.block_expand: no per-posting tile replication on device)
TILE_MODE = os.environ.get("BENCH_TILE_MODE", "topv")
# hash-mode tile width; may differ from V_CAP (the hashed retile derives
# from the v{V_CAP} base index, e.g. a V=512 hash of the v1024 build)
HASH_V = int(os.environ.get("BENCH_HASH_V", 0)) or V_CAP
BLOCK_V = int(os.environ.get("BENCH_BLOCK_V", 512))
BLOCK_POOL = int(os.environ.get("BENCH_BLOCK_POOL", 32))
# topv-mode narrowed tile width (ops/pallas_tiles.py::narrow_vocab):
# derive a V<V_CAP tile set from the v{V_CAP} build — half-width tiles
# halve the kernel/qloc/expand stages at a small pool-recall cost.
# Default 512: the round-3 operating point (probe_r3n CPU study,
# validated on device by probe_r3o): V0=512 @ qc=14 pool64/r48 holds
# recall 0.973 at half the kernel/qloc width. BENCH_NARROW_V=0 serves
# the full build width (the round-2 point).
NARROW_V = int(os.environ.get("BENCH_NARROW_V", 512))
# grouped operating point (probe_r3o grid); BENCH_POOL/BENCH_RESCORE pin
# a fixed pool config (probes/debug) — the default ladder varies them
POOL = int(os.environ.get("BENCH_POOL", 64))
RESCORE = int(os.environ.get("BENCH_RESCORE", 48))
POOL_MODE = os.environ.get("BENCH_POOL_MODE", "hier")
# pool_mode="seg" segment width (exact two-level segment pool)
SEG_W = int(os.environ.get("BENCH_SEG_W", 32))
# plan group size for the large-batch program: M=16 halves the hot
# lists' tile streaming once groups fill (probe_r4a: +12% QPS at
# B=16384, identical recall; round-3 measured M=16 NEGATIVE at B=4096
# where groups don't fill — so the B=BATCH path keeps M=8)
M_BIG = int(os.environ.get("BENCH_M_BIG", 16))
# round-5 throughput levers (probe_r5b/r5c): pool_dtype="bf16" halves
# the regrouped score-wall bytes the pool stage reads (rescore stays
# exact f32); dedup_mode="post" skips the pool-wide variadic sort;
# knn_top=m refines only the top-m heap entries' neighbors (reference
# Knn::refine economics, src/inverted_index.rs:551-593); pool_recall is
# approx_max_k's recall_target (PartialReduce keep-count knob).
# Defaults flipped after TPU certification (BENCH_STAGE_r5.json, B=16384
# M16): pool_dtype=bf16 is recall-NEUTRAL at 100K (0.9700 vs 0.9701) and
# 1M (0.9692 unchanged); dedup_mode=post costs 0.08pt but -8ms, and the
# first-compliant-rung ladder absorbs it (pdt_ddpost_qc14 = 97.8K @
# 0.9709 vs pdt-only qc13 = 95.6K @ 0.9700).
POOL_DTYPE = os.environ.get("BENCH_POOL_DTYPE", "bf16")
DEDUP_MODE = os.environ.get("BENCH_DEDUP_MODE", "post")
KNN_TOP = int(os.environ.get("BENCH_KNN_TOP", 0))
POOL_RECALL = float(os.environ.get("BENCH_POOL_RECALL", 0.98))
# fwd16: half-width packed forward twin (comp i16 | f16-bit value per
# i32 word) — halves forward HBM + rescore gather temps (the 1M compile
# wall); rescore_chunk bounds the gather's live temps (0 = unchunked)
FWD16 = os.environ.get("BENCH_FWD16", "0") == "1"
RESCORE_CHUNK = int(os.environ.get("BENCH_RESCORE_CHUNK", 0))

# Narrowing only actually applies on the topv path below V_CAP — key the
# ladder on the SAME condition (round-3 advisor finding: hash/block modes
# or BENCH_V_CAP<=512 were served with the narrow ladder, silently
# dropping the qc=10/11 rungs).
NARROWED = TILE_MODE == "topv" and bool(NARROW_V) and NARROW_V < V_CAP

# Operating-point ladder for the grouped path:
# (query_cut, pool, rescore, n_knn) in ascending cost order (per-query
# streamed bytes grow with qc; the pool/regroup/rescore stages grow with
# pool; n_knn>0 adds one k*n_knn-row exact-rescore round, the reference's
# Knn::refine, inverted_index.rs:551-593). The headline point is the
# FIRST rung whose recall@10 meets TARGET_RECALL — never a cheaper rung
# below the bar (round-3 verdict weak #1: the old `best - 0.003` fallback
# measured the headline at qc=14/0.9688 while qc=16 was compliant).
# knn rungs are skipped when no cached graph exists; the graph's bytes
# count toward the reported index size when the headline uses it.
# Narrowed tiles trade per-list vocab coverage for width, so the ladder
# starts deeper and leans on the probe_r3o sweet spots (pool96/r64,
# pool128/r96 recover the recall the narrow width costs).
N_KNN_ENV = int(os.environ.get("BENCH_N_KNN", 0))
if os.environ.get("BENCH_POOL") or os.environ.get("BENCH_RESCORE"):
    _qcs = [12, 13, 14, 16, 20, 30] if NARROWED else [10, 11, 12, 14, 16, 20, 30]
    LADDER = [(qc, POOL, RESCORE, N_KNN_ENV) for qc in _qcs]
elif NARROWED:
    LADDER = [
        # MEASURED cost order (probe_r4d, B=16384 M16): the knn-refined
        # rungs cost ~1.5-1.6x their plain base (one k*n_knn-row exact
        # rescore round), so plain rungs come first — qc13 p96/r64 knn0
        # (174 ms, 0.9701) beats qc11 p96/r64 knn16 (269 ms, 0.9708).
        (12, 64, 48, 0), (13, 64, 48, 0), (14, 64, 48, 0),
        (12, 96, 64, 0), (13, 96, 64, 0), (14, 96, 64, 0),
        (13, 128, 96, 0), (14, 128, 96, 0), (16, 128, 96, 0),
        # knn-refined fallbacks (+1.5-3pt recall over their base)
        (12, 96, 64, 8), (13, 96, 64, 8),
        (12, 96, 64, 16), (13, 96, 64, 16),
        (20, 128, 96, 0), (30, 256, 128, 0),
    ]
else:
    LADDER = [
        # plain rungs first: knn rungs cost ~1.5-1.6x their plain base
        # (probe_r4d measurement, same as the NARROWED branch), so a
        # compliant plain rung must win over a cheaper-qc knn rung
        # (advisor r4: the old knn-first order could headline a costlier
        # operating point)
        (10, 64, 48, 0), (11, 64, 48, 0), (12, 64, 48, 0),
        (12, 96, 64, 0), (14, 96, 64, 0),
        (10, 64, 48, 16), (10, 96, 64, 16), (11, 96, 64, 16),
        (14, 128, 96, 0), (16, 128, 96, 0),
        (20, 128, 96, 0), (30, 256, 128, 0),
    ]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def enable_compile_cache():
    """Persistent XLA compile cache (shared with tests/__graft_entry__):
    a validation run earlier in the session warm-starts the driver's
    ladder compiles. Best-effort — some backends can't serialize."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(ROOT, ".jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


def get_dataset():
    from seismic_tpu.data.sparse import CsrDataset
    from seismic_tpu.harness.synth import synth_dataset

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"docs_{N_DOCS}_{DIM}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
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

    base = os.path.join(
        CACHE, f"index_{N_DOCS}_{DIM}_{N_POSTINGS}_v{V_CAP}_o{TILE_OVERFLOW}"
    )
    dirpath = base + ".dir"
    legacy = base + ".index.seismic_tpu"
    if os.path.isdir(dirpath):
        t = time.time()
        arrays = IndexArrays.load_dir(dirpath)
        log(f"index mmap-loaded from cache: {time.time()-t:.2f}s")
        return arrays, base
    if os.path.exists(legacy):
        t = time.time()
        arrays = IndexArrays.load(legacy)
        log(f"index loaded from legacy npz: {time.time()-t:.1f}s")
        arrays.save_dir(dirpath)
        return arrays, base
    from seismic_tpu.build.builder import build_index

    cfg = Configuration(
        pruning=GlobalThresholdPruning(n_postings=N_POSTINGS,
                                       max_fraction=2.0),
        layout=TpuLayout(
            max_block_len=32, summary_vocab_cap=V_CAP, max_doc_nnz=256,
            tile_overflow=TILE_OVERFLOW,
        ),
    )
    import contextlib

    t = time.time()
    # keep stdout clean for the one-JSON-line contract (the builder's
    # progress prints go to stdout)
    with contextlib.redirect_stdout(sys.stderr):
        arrays = build_index(ds, cfg, value_dtype="f32", progress=True)
    build_secs = time.time() - t
    log(f"index build: {build_secs:.1f}s")
    arrays.save_dir(dirpath)
    with open(base + ".buildtime.json", "w") as f:
        json.dump({"build_secs": build_secs}, f)
    return arrays, base


def get_queries(dim):
    """N_QUERIES DISTINCT queries (fresh seed per 1024; tiling duplicates
    would let duplicate pairs share plan groups and overstate
    throughput)."""
    from seismic_tpu.harness.synth import synth_queries
    from seismic_tpu.search.engine import pad_queries

    parts = []
    remaining = N_QUERIES
    seed = 11
    while remaining > 0:
        n = min(1024, remaining)
        qc1, qv1 = synth_queries(n, dim=dim, seed=seed)
        parts.append(pad_queries(qc1, qv1, 64))
        remaining -= n
        seed += 1
    q_comps = np.concatenate([p[0] for p in parts])
    q_vals = np.concatenate([p[1] for p in parts])
    return q_comps, q_vals


def get_ground_truth(ds, q_comps, q_vals):
    path = os.path.join(CACHE, f"gt_{N_DOCS}_{DIM}_{len(q_comps)}.npz")
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


def _sync(out):
    import jax
    import jax.numpy as jnp

    x = [l for l in jax.tree.leaves(out) if hasattr(l, "shape")][0]
    np.asarray(jnp.sum(x, dtype=jnp.float32))
    return out


def pallas_gate():
    """On-TPU correctness gate: the grouped Pallas scorer (f32 exact
    config) must reproduce the XLA dynamic-slice formulation's results on
    a small nontrivial index on the REAL device (VERDICT round-1 weak #6;
    CPU CI covers interpret mode only)."""
    from seismic_tpu.config import Configuration, TpuLayout
    from seismic_tpu.build.builder import build_index
    from seismic_tpu.harness.synth import synth_dataset, synth_queries
    from seismic_tpu.search.engine import (
        SearchParams,
        pad_queries,
        search_batch,
    )
    from seismic_tpu.search.grouped import GroupedParams, search_grouped
    from seismic_tpu.search.planner import PlannerContext

    ds = synth_dataset(2000, dim=8192, seed=3)
    cfg = Configuration(
        layout=TpuLayout(max_block_len=32, summary_vocab_cap=512,
                         max_doc_nnz=256, tile_overflow=32)
    )
    arrays = build_index(ds, cfg, value_dtype="f32")
    qc, qv = synth_queries(64, dim=8192, seed=5)
    q_comps, q_vals = pad_queries(qc, qv, 64)

    # XLA formulation (doc_tiles dynamic-slice path, no Pallas).
    # HIGHEST matmul precision: XLA's default f32 dot on TPU is a single
    # bf16 MXU pass (~1e-3 relative), while the Pallas f32 kernel uses the
    # exact multi-pass decomposition — at default precision the comparison
    # noise floor would swamp real kernel bugs.
    import jax

    dev_xla = arrays.to_device(pallas_tiles=False)
    params = SearchParams(
        k=K, query_cut=10, doc_mode="tiles", full_lists=True,
        score_cut=64, dedup_pool=128, use_pallas=False,
    )
    with jax.default_matmul_precision("highest"):
        s_x, i_x = search_batch(dev_xla, q_comps, q_vals, params,
                                heap_factor=0.0)
    del dev_xla

    # grouped Pallas path, exact-operand config (csub=2 exercises the
    # super-block layout on the real device)
    dev_p = arrays.to_device(pallas_tiles=True, tile_csub=CSUB)
    ctx = PlannerContext.from_arrays(arrays, csub=CSUB)
    gp = GroupedParams(k=K, score_cut=64, pool=128, compute_dtype="f32",
                       ovf_pool=0, pool_mode="exact")
    with jax.default_matmul_precision("highest"):
        s_g, i_g = search_grouped(dev_p, ctx, q_comps, q_vals, gp,
                                  query_cut=10, M=8)

    ids_match = float(np.mean([
        set(map(int, a[a >= 0])) == set(map(int, b[b >= 0]))
        for a, b in zip(i_x, i_g)
    ]))
    srel = float(np.max(np.abs(s_g - s_x) / np.maximum(np.abs(s_x), 1e-6)))
    ok = ids_match >= 0.98 and srel < 1e-3
    log(f"pallas gate: ids_match={ids_match:.3f} max_rel_err={srel:.2e} "
        f"ok={ok}")
    if not ok:
        raise AssertionError(
            f"Pallas-vs-XLA gate failed: ids_match={ids_match} srel={srel}"
        )
    return {"ids_match": ids_match, "max_rel_err": srel}


def main():
    t_all = time.time()
    import jax

    # BENCH_PLATFORM=cpu forces the CPU backend for offline smoke runs
    # (the axon TPU plugin overrides the JAX_PLATFORMS env var, and
    # jax.devices() hangs machine-wide when the tunnel is down)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    enable_compile_cache()
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    from seismic_tpu.search.grouped import (
        DevicePlan,
        GroupedParams,
        plan_caps,
        search_grouped_derive_jit,
        search_grouped_jit,
    )
    from seismic_tpu.search.planner import PlannerContext, plan_grouped

    # BENCH_SKIP_GATE=1 skips the Pallas-vs-XLA gate (CPU smoke runs /
    # fast iteration; the driver's real runs keep it on)
    gate = None if os.environ.get("BENCH_SKIP_GATE") else pallas_gate()

    ds = get_dataset()
    arrays, index_base = get_index(ds)
    q_comps, q_vals = get_queries(DIM)
    gt_ids = get_ground_truth(ds, q_comps, q_vals)

    def strip_unused(a):
        # the grouped + rescore path never reads the overflow entries,
        # CSR/dense summaries, or sketches — skip ~1.9 GB of upload + HBM
        # (space is reported from the full on-disk index above)
        for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
                  "summary_codes", "dense_summary", "dense_scale",
                  "block_sketch", "block_sketch_scale", "doc_sketch",
                  "doc_sketch_scale"):
            setattr(a, f, None)

    if TILE_MODE == "topv" and NARROW_V and NARROW_V < V_CAP:
        from seismic_tpu.ops.pallas_tiles import narrow_vocab
        from seismic_tpu.types import IndexArrays

        ndir = index_base + f"_nw{NARROW_V}.dir"
        t0 = time.time()
        if os.path.isdir(ndir):
            arrays = IndexArrays.load_dir(ndir)
            log(f"narrowed index loaded: {ndir}")
        else:
            arrays = narrow_vocab(arrays, NARROW_V)
            arrays.save_dir(ndir)
            log(f"narrow_vocab(V0={NARROW_V}): {time.time()-t0:.1f}s "
                f"-> {ndir}")
        arrays_dir = ndir
    else:
        arrays_dir = index_base + ".dir" if TILE_MODE == "topv" else None

    # space is reported for the index actually served (incl. narrowing)
    space = arrays.space_usage_report()

    tile_hash = 0
    if TILE_MODE == "block":
        # memory-lean configuration: DENSE block-summary tiles (exact u8
        # over the list vocab, probe_r3p) + block_expand exact rescore.
        # Needs the summary arrays, so the retile runs BEFORE stripping.
        from seismic_tpu.ops.pallas_tiles import block_pool_arrays, narrow_vocab

        t0 = time.time()
        if arrays.dense_summary is not None:
            if BLOCK_V < arrays.dense_summary.shape[1]:
                arrays = narrow_vocab(arrays, BLOCK_V)
            arrays = block_pool_arrays(arrays, BLOCK_V, mode="dense",
                                       order_members=True)
        else:
            arrays = block_pool_arrays(arrays, BLOCK_V, mode="hash",
                                       order_members=True)
            tile_hash = BLOCK_V
        strip_unused(arrays)
        log(f"block_pool_arrays(V={BLOCK_V}, "
            f"hash={bool(tile_hash)}): {time.time()-t0:.1f}s")
    else:
        strip_unused(arrays)
    if TILE_MODE == "hash":
        # hashed tiles: retile from the (cached) hashed dir if present,
        # else hash on the fly (~90 s host at 100K)
        from seismic_tpu.ops.pallas_tiles import hash_retile
        from seismic_tpu.types import IndexArrays

        hdir = os.path.join(
            CACHE,
            f"index_{N_DOCS}_{DIM}_{N_POSTINGS}_v{V_CAP}"
            f"_o{TILE_OVERFLOW}_hash{HASH_V}.dir",
        )
        if os.path.isdir(hdir):
            arrays = IndexArrays.load_dir(hdir)
            for f in ("tile_ovf_comps", "tile_ovf_vals", "summary_comps",
                      "summary_codes", "dense_summary", "dense_scale",
                      "block_sketch", "block_sketch_scale", "doc_sketch",
                      "doc_sketch_scale"):
                setattr(arrays, f, None)
            log(f"hashed index loaded: {hdir}")
        else:
            t0 = time.time()
            arrays = hash_retile(arrays, HASH_V)
            log(f"hash_retile: {time.time()-t0:.1f}s")
        tile_hash = HASH_V
    t0 = time.time()
    # topv path: mmap the aligned tile layout from the on-disk cache
    # instead of re-running the ~8-min random-order gather every run
    # (block/hash modes derive their arrays in-memory — no stable dir
    # to fingerprint, so they keep the inline gather)
    aligned = None
    if arrays_dir is not None and os.path.isdir(arrays_dir):
        from seismic_tpu.ops_pallas_prep import load_or_build_aligned
        aligned = load_or_build_aligned(arrays, arrays_dir, CSUB)
    index = arrays.to_device(pallas_tiles=True, tile_csub=CSUB,
                             tile_hash=tile_hash, fwd_f16=FWD16,
                             _aligned=aligned)
    ctx = PlannerContext.from_arrays(arrays, csub=CSUB)
    log(f"to_device+ctx: {time.time()-t0:.1f}s")

    # cached kNN graph (built once by bench_knn / the cache rebuild):
    # enables the knn-refined ladder rungs; its bytes are added to the
    # reported index size if the headline rung uses it
    import dataclasses as _dcl

    from seismic_tpu.search import knn as knn_mod
    from seismic_tpu.types import KNN_SUFFIX

    knn_path = index_base + ".knn16"
    knn_np = None
    if os.path.exists(knn_path + KNN_SUFFIX):
        knn_np = knn_mod.load_knn(knn_path)
        index = _dcl.replace(index,
                             knn=jax.device_put(jnp.asarray(knn_np)))
        log(f"knn graph attached: {knn_np.shape}")
    device_bytes = int(sum(
        x.nbytes for x in jax.tree.leaves(index) if hasattr(x, "nbytes")
    ))
    log(f"device HBM bytes: {device_bytes/1e9:.2f} GB (tile_mode="
        f"{TILE_MODE})")

    def make_gp(pool, rescore, n_knn=0):
        if TILE_MODE == "block":
            # pool BLOCKS, expand every member posting into the exact
            # rescore (max_block_len=32 in the bench build config)
            return GroupedParams(k=K, score_cut=64, pool=BLOCK_POOL,
                                 block_expand=int(arrays.max_block_len),
                                 compute_dtype="i8", pool_mode="hier",
                                 pool_per_pair=max(4, BLOCK_POOL // 4),
                                 kernel_unroll=8, n_knn=n_knn,
                                 pool_dtype=POOL_DTYPE,
                                 dedup_mode=DEDUP_MODE,
                                 knn_top=KNN_TOP if n_knn else 0,
                                 pool_recall=POOL_RECALL,
                                 rescore_chunk=RESCORE_CHUNK)
        return GroupedParams(k=K, score_cut=64, pool=pool, rescore=rescore,
                             compute_dtype="i8", pool_mode=POOL_MODE,
                             pool_per_pair=16 if POOL_MODE == "hier" else 0,
                             pool_seg_width=SEG_W,
                             kernel_unroll=8, n_knn=n_knn,
                             pool_dtype=POOL_DTYPE, dedup_mode=DEDUP_MODE,
                             knn_top=KNN_TOP if n_knn else 0,
                             pool_recall=POOL_RECALL,
                             rescore_chunk=RESCORE_CHUNK)

    n_batches = max(1, N_QUERIES // BATCH)

    def run_rung(query_cut, B, n_b, params, ix=None):
        """Device-derived planning: the host's native planner supplies only
        the static (G_cap, W_cap); the jit program re-derives the plan
        from the queries (no plan upload)."""
        outs = []
        stats = None
        for b in range(n_b):
            qc_np = q_comps[b * B: (b + 1) * B]
            qv_np = q_vals[b * B: (b + 1) * B]
            plan = plan_grouped(qc_np, qv_np, ctx, query_cut, M=8)
            out = search_grouped_derive_jit(
                ix if ix is not None else index,
                jnp.asarray(qc_np, jnp.int32),
                jnp.asarray(qv_np, jnp.float32), params,
                query_cut, 8, plan.G_cap, plan.W_cap, ctx.zero_region,
            )
            outs.append(np.asarray(out[1]))
            stats = plan
        return np.concatenate(outs), stats

    # ---- accuracy ladder over (query_cut, pool, rescore) ----
    # Walk the cost-ascending operating ladder; the headline point is the
    # FIRST rung at/above TARGET_RECALL. Only if NO rung is compliant
    # fall back to the best-recall rung, explicitly marked BELOW TARGET
    # in the metric string (round-3 verdict weak #1).
    rungs = []
    chosen = None
    for query_cut, pool_i, resc_i, nk_i in LADDER:
        if nk_i > 0 and knn_np is None:
            continue  # no cached graph: knn rungs unavailable
        gp_i = make_gp(pool_i, resc_i, nk_i)
        ids, plan = run_rung(query_cut, BATCH, n_batches, gp_i)
        rec = recall_at_k(ids, gt_ids)
        tile_w = int(arrays.doc_tiles.shape[1])
        streamed_kb = plan.W * CSUB * 128 * tile_w / BATCH / 1e3
        log(f"qc={query_cut} pool={pool_i}/r{resc_i} knn={nk_i}: "
            f"recall@10={rec:.4f} "
            f"streamed/query={streamed_kb:.0f}KB W={plan.W}")
        rungs.append({"query_cut": query_cut, "pool": pool_i,
                      "rescore": resc_i, "n_knn": nk_i,
                      "recall_at_10": round(rec, 4),
                      "streamed_kb": round(streamed_kb)})
        if rec >= TARGET_RECALL:
            chosen = (query_cut, pool_i, resc_i, nk_i, rec, streamed_kb)
            break
    below_target = chosen is None
    if below_target:
        # no compliant rung: report the best-recall one, loudly marked
        ri = max(range(len(rungs)), key=lambda i: rungs[i]["recall_at_10"])
        r = rungs[ri]
        chosen = (r["query_cut"], r["pool"], r["rescore"], r["n_knn"],
                  r["recall_at_10"], r["streamed_kb"])
        log(f"WARNING: no ladder rung reached TARGET_RECALL="
            f"{TARGET_RECALL}; headline is BELOW TARGET at "
            f"recall={chosen[4]:.4f}")
    query_cut, pool_sel, resc_sel, nknn_sel, rec, streamed_kb = chosen
    gp = make_gp(pool_sel, resc_sel, nknn_sel)
    if nknn_sel > 0 and int(space.get("knn", 0)) == 0:
        # the graph is part of the served index: count its bytes (guard:
        # space_usage_report already folds knn into total when arrays.knn
        # was populated before the report ran — don't double-count)
        space["knn"] = int(knn_np.nbytes)
        space["total"] = int(space.get("total", 0)) + int(knn_np.nbytes)

    # ---- throughput (e2e: host caps + device-derived plan + search) ----
    def once(qc_np, qv_np, qc_dev, qv_dev):
        gc, wc = plan_caps(qc_np, qv_np, ctx, query_cut, M=8)
        return search_grouped_derive_jit(
            index, qc_dev, qv_dev, gp, query_cut, 8, gc, wc,
            ctx.zero_region,
        )

    qcd = [jnp.asarray(q_comps[b * BATCH:(b + 1) * BATCH], jnp.int32)
           for b in range(n_batches)]
    qvd = [jnp.asarray(q_vals[b * BATCH:(b + 1) * BATCH], jnp.float32)
           for b in range(n_batches)]
    qcn = [q_comps[b * BATCH:(b + 1) * BATCH] for b in range(n_batches)]
    qvn = [q_vals[b * BATCH:(b + 1) * BATCH] for b in range(n_batches)]

    # tunnel/dispatch round-trip (the axon tunnel's sync RTT dominates
    # small-batch latency and adds ~RTT/reps to the throughput loop)
    f_id = jax.jit(lambda x: x + 1)
    _sync((f_id(jnp.float32(1.0)),))
    rtts = []
    for _ in range(9):
        t0 = time.time()
        _sync((f_id(jnp.float32(1.0)),))
        rtts.append(time.time() - t0)
    rtt_ms = float(np.median(rtts) * 1e3)
    log(f"tunnel sync RTT p50: {rtt_ms:.1f}ms")

    _sync(once(qcn[0], qvn[0], qcd[0], qvd[0]))  # warm
    reps = 20
    t0 = time.time()
    out = None
    for _ in range(reps):
        for b in range(n_batches):
            out = once(qcn[b], qvn[b], qcd[b], qvd[b])
    _sync(out)
    elapsed = time.time() - t0
    qps = (reps * n_batches * BATCH) / elapsed
    log(f"QPS(B={BATCH}) = {qps:.0f}")

    # ---- large-batch throughput: one program over ALL N_QUERIES ----
    # Bigger batches amortize the per-dispatch overhead and the pool/tail
    # stages (probe r3d: B=16384 is ~7% faster per query than B=4096 at
    # identical per-query work and recall; results per query are
    # batch-size-invariant — the pool/top-k are per-query rows).
    qps_big = None
    big_batch = N_QUERIES
    if N_QUERIES > BATCH:
        qcB = jnp.asarray(q_comps, jnp.int32)
        qvB = jnp.asarray(q_vals, jnp.float32)
        gcB, wcB = plan_caps(q_comps, q_vals, ctx, query_cut, M=M_BIG)

        def once_big():
            return search_grouped_derive_jit(
                index, qcB, qvB, gp, query_cut, M_BIG, gcB, wcB,
                ctx.zero_region,
            )

        _sync(once_big())
        reps_b = 8
        t0 = time.time()
        outb = None
        for _ in range(reps_b):
            outb = once_big()
        _sync(outb)
        qps_big = (reps_b * N_QUERIES) / (time.time() - t0)
        log(f"QPS(B={N_QUERIES}) = {qps_big:.0f}")

    # ---- p50 latency rungs (per-batch sync; batch = 1, 64, BATCH) ----
    p50 = {}
    for B in (1, 64, BATCH):
        qc_np = q_comps[:B]
        qv_np = q_vals[:B]
        qc_dev = jnp.asarray(qc_np, jnp.int32)
        qv_dev = jnp.asarray(qv_np, jnp.float32)

        def once_b(qc_np=qc_np, qv_np=qv_np, qc_dev=qc_dev, qv_dev=qv_dev):
            gc, wc = plan_caps(qc_np, qv_np, ctx, query_cut, M=8)
            return search_grouped_derive_jit(
                index, qc_dev, qv_dev, gp, query_cut, 8, gc, wc,
                ctx.zero_region,
            )

        _sync(once_b())  # compile this batch class
        times = []
        for _ in range(7 if B <= 64 else 3):
            t0 = time.time()
            _sync(once_b())
            times.append(time.time() - t0)
        p50[f"b{B}"] = round(float(np.median(times) * 1e3), 2)
    log(f"p50 latency ms: {p50}")

    # ---- device-only small-batch latency (VERDICT r2 item 5) ----
    # One tunnel sync costs ~rtt_ms, swamping small-batch device time.
    # Pipelining K async dispatches and syncing ONCE measures per-call
    # device occupancy (host planning is amortized: caps are static per
    # batch class; the plan derives on device from the queries).
    device_ms = {}
    for B in (1, 16, 64):
        qc_np, qv_np = q_comps[:B], q_vals[:B]
        qc_dev = jnp.asarray(qc_np, jnp.int32)
        qv_dev = jnp.asarray(qv_np, jnp.float32)
        gcb, wcb = plan_caps(qc_np, qv_np, ctx, query_cut, M=8)

        def once_d(qc_dev=qc_dev, qv_dev=qv_dev, gcb=gcb, wcb=wcb):
            return search_grouped_derive_jit(
                index, qc_dev, qv_dev, gp, query_cut, 8, gcb, wcb,
                ctx.zero_region,
            )

        _sync(once_d())
        K_reps = 100 if B <= 16 else 30
        t0 = time.time()
        out = None
        for _ in range(K_reps):
            out = once_d()
        _sync(out)
        device_ms[f"b{B}"] = round(
            (time.time() - t0) / K_reps * 1e3, 3
        )
    log(f"device-only latency ms (pipelined): {device_ms}")

    # ---- deep kNN-refinement rung (best-recall side point) ----
    # The ladder above owns the headline; this rung records the recall
    # ceiling a deeper (qc=14, knn16) refined point reaches.
    knn_rung = None
    if knn_np is not None and nknn_sel == 0:
        if TILE_MODE == "block":
            gp_knn = _dcl.replace(gp, pool_mode="approx", n_knn=8)
        else:
            gp_knn = GroupedParams(k=K, score_cut=64, pool=96, rescore=64,
                                   compute_dtype="i8", pool_mode="hier",
                                   pool_per_pair=16, kernel_unroll=8,
                                   n_knn=16)
        qc_rung = 14
        gc, wc = plan_caps(q_comps[:1024], q_vals[:1024], ctx, qc_rung,
                           M=8)
        kqd = jnp.asarray(q_comps[:1024], jnp.int32)
        kvd = jnp.asarray(q_vals[:1024], jnp.float32)
        out = _sync(search_grouped_derive_jit(
            index, kqd, kvd, gp_knn, qc_rung, 8, gc, wc,
            ctx.zero_region))
        r_knn = recall_at_k(np.asarray(out[1]), gt_ids[:1024])
        t0 = time.time()
        for _ in range(5):
            out = search_grouped_derive_jit(
                index, kqd, kvd, gp_knn, qc_rung, 8, gc, wc,
                ctx.zero_region)
        _sync(out)
        dt = (time.time() - t0) / 5
        knn_rung = {
            "query_cut": qc_rung, "n_knn": gp_knn.n_knn,
            "recall_at_10": round(r_knn, 4),
            "qps": round(1024 / dt, 1),
        }
        log(f"knn rung: {knn_rung}")

    # headline = best batch size (recall is batch-size-invariant and was
    # measured over ALL N_QUERIES in the accuracy ladder above)
    qps_best, batch_best = qps, BATCH
    if qps_big is not None and qps_big > qps:
        qps_best, batch_best = qps_big, big_batch
    log(
        f"QPS={qps_best:.0f} (batch {batch_best}) recall@10={rec:.4f} "
        f"qc={query_cut} total_bench_time={time.time()-t_all:.0f}s"
    )
    bar = (f"recall@10>={TARGET_RECALL} (measured {rec:.4f})"
           if not below_target else
           f"recall@10={rec:.4f} BELOW TARGET {TARGET_RECALL}")
    result = {
        "metric": (
            f"batched QPS/chip at {bar} "
            f"(synthetic SPLADE, {N_DOCS} docs, dim {DIM}, k={K}, "
            f"qc={query_cut}, pool={pool_sel}/r{resc_sel}, "
            f"n_knn={nknn_sel}, "
            f"grouped i8 MXU path + exact rescore, e2e "
            f"incl. host planning, batch {batch_best})"
        ),
        "value": round(qps_best, 1),
        "unit": "qps",
        "vs_baseline": round(qps_best / BASELINE_QPS, 2),
        "below_target": below_target,
        "target_recall": TARGET_RECALL,
        "ladder": rungs,
        "qps_by_batch": {
            f"b{BATCH}": round(qps, 1),
            **({f"b{big_batch}": round(qps_big, 1)}
               if qps_big is not None else {}),
        },
        "recall_at_10": round(rec, 4),
        "p50_ms": p50,
        "device_ms": device_ms,
        "streamed_kb_per_query": round(streamed_kb),
        "tunnel_rtt_ms": round(rtt_ms, 1),
        "p50_note": (
            "p50_ms includes one tunnel sync round-trip "
            f"(~{rtt_ms:.0f}ms on this axon setup); device_ms is the "
            "device-only per-call time (K pipelined dispatches, one "
            "sync) — the hardware latency a co-located host would see"
        ),
        "index_bytes": space,
        "device_bytes": device_bytes,
        "tile_mode": TILE_MODE,
        # served tile width: runs are self-describing across the
        # BENCH_NARROW_V default change (round-3 advisor finding)
        "narrow_v": NARROW_V if NARROWED else 0,
        "served_tile_width": int(arrays.doc_tiles.shape[1])
        if arrays.doc_tiles is not None else None,
        "pool_mode": POOL_MODE,
        "n_knn": nknn_sel,
        "m_big": M_BIG,
        "knn_rung": knn_rung,
        "pallas_gate": gate,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
