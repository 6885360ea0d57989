"""Round-4 probe C (host-only, no TPU): the 1M ABSENT ceiling.

For each query, the grouped path can only ever return docs that appear
in a posting list the planner selects (top-query_cut lists by query
value). The fraction of GT@10 docs present in that union is a hard
recall ceiling at each query_cut — everything the pool/rescore stages
do happens below it (probe_r3n's ABSENT vs RANKED decomposition, now
measured at 1M scale on the fresh c1m cache).

If the ceiling at qc=16-20 is < ~0.98, deeper pools cannot reach the
0.97 bar and the lever is coverage: more postings per list (reference
uses n_postings 3000-4000/list at 8.8M docs vs this build's 400), or
knn refinement (reachability through graph edges of reachable docs).
The knn ceiling measured here: GT doc is reachable if it is in the
union OR is a knn16 neighbor of a pooled-rank doc (upper bound: any
union doc).

Usage: python -m seismic_tpu.harness.probe_r4c [qc ...]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("BENCH_N_DOCS", "1000000")
    os.environ.setdefault("BENCH_N_QUERIES", "2048")
    os.environ.setdefault("BENCH_N_POSTINGS", "400")
    os.environ.setdefault("BENCH_TILE_OVERFLOW", "0")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import bench
    from seismic_tpu.types import KNN_SUFFIX, IndexArrays
    from seismic_tpu.search import knn as knn_mod

    qcs = [int(a) for a in sys.argv[1:]] or [10, 12, 14, 16, 20, 30]
    base = os.path.join(
        CACHE,
        f"index_{bench.N_DOCS}_{bench.DIM}_{bench.N_POSTINGS}"
        f"_v{bench.V_CAP}_o{bench.TILE_OVERFLOW}")
    t0 = time.time()
    arrays = IndexArrays.load_dir(base + ".dir")
    log(f"index mmap-loaded: {time.time()-t0:.1f}s")
    q_comps, q_vals = bench.get_queries(bench.DIM)
    gt_path = os.path.join(
        CACHE, f"gt_{bench.N_DOCS}_{bench.DIM}_{len(q_comps)}.npz")
    with np.load(gt_path) as z:
        gt_ids = z["ids"][:, :10]
    knn_path = base + ".knn16"
    knn = (np.asarray(knn_mod.load_knn(knn_path))
           if os.path.exists(knn_path + KNN_SUFFIX) else None)
    log(f"knn graph: {'loaded ' + str(knn.shape) if knn is not None else 'absent'}")

    # per-list posting id ranges (blocks are contiguous per list)
    lbs = np.asarray(arrays.list_block_start)
    lnb = np.asarray(arrays.list_n_blocks)
    bstart = np.asarray(arrays.block_start)
    blen = np.asarray(arrays.block_len)
    postings = np.asarray(arrays.postings)

    def list_docs(l):
        b0 = lbs[l]
        bs = bstart[b0: b0 + lnb[l]]
        bl = blen[b0: b0 + lnb[l]]
        if len(bs) == 0:
            return postings[:0]
        return np.concatenate(
            [postings[s: s + n] for s, n in zip(bs, bl)])

    B = len(gt_ids)
    order = np.argsort(-np.abs(q_vals[:B]), axis=1, kind="stable")
    comps_sorted = np.take_along_axis(q_comps[:B], order, axis=1)
    qcs = sorted(qcs)
    qc_max = qcs[-1]

    hits = {qc: 0 for qc in qcs}
    hits_knn = {qc: 0 for qc in qcs}
    tot = 0
    t0 = time.time()
    for i in range(B):
        g = {int(x) for x in gt_ids[i] if x >= 0}
        tot += len(g)
        seen: set = set()
        seen_knn: set = set()
        prev = 0
        for qc in qcs:
            for c in comps_sorted[i, prev:qc]:
                c = int(c)
                # pad components are PAD_COMPONENT (INT32_MAX), not -1
                if c < 0 or c >= len(lnb):
                    continue
                d = list_docs(c)
                seen.update(d.tolist())
                if knn is not None and len(d):
                    seen_knn.update(knn[d].ravel().tolist())
            prev = qc
            hits[qc] += len(seen & g)
            if knn is not None:
                hits_knn[qc] += len((seen | seen_knn) & g)
        if i % 256 == 255:
            log(f"  {i+1}/{B} queries ({time.time()-t0:.0f}s)")
    for qc in qcs:
        ceil = hits[qc] / max(tot, 1)
        ceil_k = hits_knn[qc] / max(tot, 1) if knn is not None else -1.0
        log(f"qc={qc:3d}: ABSENT ceiling={ceil:.4f}"
            f"  with-knn16 ceiling={ceil_k:.4f}")


if __name__ == "__main__":
    main()
