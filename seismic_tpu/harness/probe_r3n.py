"""Round-3 probe N (CPU, numpy-only): truncated-vocab width x pool
depth, and a miss diagnosis — the EXACT-mechanism study that replaces
the dead sketch family (probe_r3l/r3m: count-sketch tails add more
pool-scrambling variance than the truncation bias they remove, because
SPLADE dots are tiny relative to norm products).

For each tile vocab width V0 (simulated by masking each list's vocab to
its top-V0 terms by importance, build.builder vocab_rank) and each
(pool, rescore) depth, replays the grouped pooling math per query:
candidates from the top-qc lists, per-pair truncated tile scores,
dedup-max, pool, exact rescore, recall@10 vs cached GT.

Also classifies every GT miss as
  ABSENT — the doc is in no scanned list's postings (pool-proof: only
           more lists / deeper postings / knn can recover it), or
  RANKED — in the candidate set but below the pool cut (fixable by a
           deeper pool/rescore tail).
and reports the pool depth needed to cover the RANKED misses.

Decides: (a) whether V0=512/768 tiles + deeper pools can serve the 100K
bench at less kernel/qloc cost (150K QPS mission), (b) whether the 1M
recall ceiling (SCALE_BENCH 0.954) is pool-limited or candidate-limited.

Usage:
  JAX_PLATFORMS=cpu python -m seismic_tpu.harness.probe_r3n [nq] [qc...]
  BENCH_N_DOCS=1000000 BENCH_N_POSTINGS=400 BENCH_TILE_OVERFLOW=0 \
  BENCH_N_QUERIES=2048 JAX_PLATFORMS=cpu python -m ... (1M scale)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    qcuts = [int(a) for a in sys.argv[2:]] or [11]
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import bench

    t0 = time.time()
    from seismic_tpu.data.sparse import PAD_COMPONENT
    from seismic_tpu.types import IndexArrays

    base = os.path.join(
        bench.CACHE,
        f"index_{bench.N_DOCS}_{bench.DIM}_{bench.N_POSTINGS}"
        f"_v{bench.V_CAP}_o{bench.TILE_OVERFLOW}")
    arrays = IndexArrays.load_dir(base + ".dir")
    q_comps, q_vals = bench.get_queries(bench.DIM)
    gt = np.load(os.path.join(
        bench.CACHE,
        f"gt_{bench.N_DOCS}_{bench.DIM}_{len(q_comps)}.npz"))["ids"]
    nq = min(nq, len(q_comps))
    q_comps, q_vals, gt = q_comps[:nq], q_vals[:nq], gt[:nq]

    fc = np.asarray(arrays.fwd_comps)
    mask = fc != PAD_COMPONENT
    vals = np.asarray(arrays.fwd_vals).astype(np.float32)
    vals = np.where(mask, vals, 0.0)
    fc_safe = np.where(mask, fc, 0)
    lps = np.asarray(arrays.list_post_start, np.int64)
    ll = np.asarray(arrays.list_len, np.int64)
    posts = np.asarray(arrays.postings)
    lv = np.asarray(arrays.list_vocab).astype(np.int64)
    vr = np.asarray(arrays.vocab_rank)
    DIM, V_BUILD = bench.DIM, lv.shape[1]
    print(f"load: {time.time()-t0:.1f}s  ({nq} queries, "
          f"{bench.N_DOCS} docs, build V={V_BUILD})", flush=True)

    SC, K = 64, 10
    POOLS = ((64, 48), (128, 96), (256, 128), (512, 256))
    if os.environ.get("R3N_POOLS"):
        POOLS = tuple(
            tuple(int(x) for x in p.split("/"))
            for p in os.environ["R3N_POOLS"].split(","))
    WIDTHS = [w for w in (V_BUILD, 768, 512) if w <= V_BUILD]

    for QC in qcuts:
        for V0 in WIDTHS:
            rec = {p: 0 for p in POOLS}
            tot = absent = ranked_cov = 0
            need_depth = []  # pool depth that would cover each RANKED miss
            t0 = time.time()
            for qi in range(nq):
                qc_, qv_ = q_comps[qi], q_vals[qi]
                valid = qc_ != PAD_COMPONENT
                qc_, qv_ = qc_[valid].astype(np.int64), qv_[valid]
                qdense = np.zeros(DIM, np.float32)
                qdense[qc_] = qv_
                topq = np.argsort(-qv_, kind="stable")[:SC]
                sqc, sqv = qc_[topq], qv_[topq]
                qd_top = np.zeros(DIM, np.float32)
                qd_top[sqc] = sqv
                lists = sqc[np.argsort(-sqv, kind="stable")[:QC]]
                best: dict[int, float] = {}
                for li in lists:
                    docs = posts[lps[li]: lps[li] + ll[li]]
                    if len(docs) == 0:
                        continue
                    sel = lv[li][vr[li] < V0] if V0 < V_BUILD else lv[li]
                    vm = np.zeros(DIM, bool)
                    vm[sel] = True
                    s = ((qd_top * vm)[fc_safe[docs]] * vals[docs]).sum(1)
                    for d, sd in zip(docs.tolist(), s.tolist()):
                        if sd > best.get(d, -1e30):
                            best[d] = sd
                gset = {int(x) for x in gt[qi][:K] if x >= 0}
                tot += len(gset)
                if not best:
                    absent += len(gset)
                    continue
                cand = np.fromiter(best.keys(), np.int64, len(best))
                sco = np.fromiter(best.values(), np.float32, len(best))
                order_ = np.argsort(-sco, kind="stable")
                pos = {int(cand[order_[i]]): i for i in range(len(order_))}
                for g in gset:
                    if g not in pos:
                        absent += 1
                    else:
                        ranked_cov += 1
                        need_depth.append(pos[g] + 1)
                for pool, resc in POOLS:
                    sel_ = cand[order_[:pool][:resc]]
                    exact = (qdense[fc_safe[sel_]] * vals[sel_]).sum(1)
                    topk = sel_[np.argsort(-exact, kind="stable")[:K]]
                    rec[(pool, resc)] += len(
                        gset & {int(x) for x in topk})
            nd = np.sort(np.asarray(need_depth))
            line = "  ".join(
                f"p{p}/r{r}={rec[(p, r)]/max(tot,1):.4f}"
                for p, r in POOLS)
            print(f"qc={QC} V0={V0}: {line}", flush=True)
            print(f"    misses: absent={absent/max(tot,1):.4f} "
                  f"(candidate-limited); present-doc pool depth p90="
                  f"{int(nd[int(0.9*len(nd))]) if len(nd) else 0} "
                  f"p99={int(nd[int(0.99*len(nd))]) if len(nd) else 0} "
                  f"p999={int(nd[int(0.999*len(nd))]) if len(nd) else 0} "
                  f"max={int(nd[-1]) if len(nd) else 0}  "
                  f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
