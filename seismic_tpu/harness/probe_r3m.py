"""Round-3 probe M (CPU, numpy-only): HYBRID tile column maps.

probe_r3l showed pure hashed tiles cannot pool at bench scale even with
the count-sketch sign fix (signed V=1024: 0.73 at pool64 vs 0.9725 for
truncated tiles) — sketch variance, not collision bias, is the binding
constraint. This probe tests column maps that keep most of the dot-mass
EXACT and sketch only a residual:

  A. per-list truncated tiles (the production scheme) — simulator
     fidelity baseline, expect ~0.97 at pool64/r48.
  B. per-list truncated + H signed-hash columns holding each posting's
     RESIDUAL terms (outside the list vocab). Targets the 1M-doc recall
     ceiling (SCALE_BENCH ~0.954): vocabulary-truncation misses become
     zero-mean noise instead of systematically lost mass. Projection
     stays per-pair (vocab gather) — a recall-at-scale candidate, not a
     qloc-chain fix.
  C. global-exact top-D columns (collection-mass rank permutation) +
     signed tail hash in V-D columns. List-independent column meaning =
     per-QUERY projection (the hashed path's throughput win) with the
     heavy mass exact.

Pooling protocol mirrors probe_r3l (union/dedup-max candidates from the
top-qc lists, pool -> exact rescore -> recall@10 vs cached GT).

Usage: JAX_PLATFORMS=cpu python -m seismic_tpu.harness.probe_r3m [nq]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)

from seismic_tpu.harness.probe_r3l import MULT, sign_of  # noqa: E402


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 256
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
    q_comps, q_vals, gt = q_comps[:nq], q_vals[:nq], gt[:nq]

    fc = np.asarray(arrays.fwd_comps)
    mask = fc != PAD_COMPONENT
    vals = np.asarray(arrays.fwd_vals).astype(np.float32)
    vals = np.where(mask, vals, 0.0)
    fc_safe = np.where(mask, fc, 0)
    lps = np.asarray(arrays.list_post_start, np.int64)
    ll = np.asarray(arrays.list_len, np.int64)
    posts = np.asarray(arrays.postings)
    lv = np.asarray(arrays.list_vocab).astype(np.int64)  # [n_lists, V0]
    DIM = bench.DIM
    print(f"load: {time.time()-t0:.1f}s  ({nq} queries)", flush=True)

    QC, SC, K = 11, 64, 10
    POOLS = ((64, 48), (128, 96))

    # global collection term mass (importance rank for scheme C)
    gmass = np.bincount(fc_safe.reshape(-1),
                        weights=vals.reshape(-1), minlength=DIM)
    grank = np.full(DIM, 1 << 30, np.int64)
    order = np.argsort(-gmass, kind="stable")
    grank[order] = np.arange(DIM)

    def eval_scheme(label, score_fn):
        """score_fn(qi, qdense, sqc, sqv) -> (cand_ids, cand_scores)."""
        rec = {p: 0 for p in POOLS}
        tot = 0
        t0 = time.time()
        for qi in range(nq):
            qc_, qv_ = q_comps[qi], q_vals[qi]
            valid = qc_ != PAD_COMPONENT
            qc_, qv_ = qc_[valid].astype(np.int64), qv_[valid]
            qdense = np.zeros(DIM, np.float32)
            qdense[qc_] = qv_
            topq = np.argsort(-qv_, kind="stable")[:SC]
            cand, sco = score_fn(qi, qdense, qc_[topq], qv_[topq])
            gset = {int(x) for x in gt[qi][:K] if x >= 0}
            tot += len(gset)
            if len(cand) == 0:
                continue
            order_ = np.argsort(-sco, kind="stable")
            for pool, resc in POOLS:
                sel = cand[order_[:pool][:resc]]
                exact = (qdense[fc_safe[sel]] * vals[sel]).sum(axis=1)
                topk = sel[np.argsort(-exact, kind="stable")[:K]]
                rec[(pool, resc)] += len(gset & {int(x) for x in topk})
        for pool, resc in POOLS:
            print(f"{label:34s} pool{pool}/r{resc}: "
                  f"recall@10={rec[(pool, resc)]/max(tot,1):.4f}"
                  f"  ({time.time()-t0:.0f}s)", flush=True)

    def top_lists(qdense, sqc, sqv):
        o = np.argsort(-sqv, kind="stable")[:QC]
        return sqc[o]

    # ---------------- A/B: per-list truncated (+ residual tail) --------
    def perlist_fn(H, signed=True):
        def fn(qi, qdense, sqc, sqv):
            lists = top_lists(qdense, sqc, sqv)
            best: dict[int, float] = {}
            qd_top = np.zeros(DIM, np.float32)
            qd_top[sqc] = sqv  # query restricted to its top-SC terms
            for li in lists:
                docs = posts[lps[li]: lps[li] + ll[li]]
                if len(docs) == 0:
                    continue
                vm = np.zeros(DIM, bool)
                vm[lv[li]] = True
                s = ((qd_top * vm)[fc_safe[docs]] * vals[docs]).sum(1)
                if H > 0:
                    # signed residual tail: doc terms outside the vocab
                    tail_q = ~vm[sqc]
                    if tail_q.any():
                        qh = np.zeros(H, np.float32)
                        tq = sqc[tail_q]
                        w = sqv[tail_q] * (sign_of(tq) if signed else 1.0)
                        np.add.at(qh, (tq.astype(np.uint64) * np.uint64(MULT)) % H, w)
                        dfc = fc_safe[docs]
                        tail_d = mask[docs] & ~vm[dfc]
                        w_d = np.where(
                            tail_d,
                            vals[docs] * (sign_of(dfc) if signed else 1.0),
                            0.0)
                        cols = ((dfc.astype(np.uint64) * np.uint64(MULT)) % H).astype(np.int64)
                        n_d, W = dfc.shape
                        r = np.repeat(np.arange(n_d, dtype=np.int64), W)
                        dh = np.bincount(
                            r * H + cols.reshape(-1),
                            weights=w_d.reshape(-1),
                            minlength=n_d * H).reshape(n_d, H)
                        s = s + dh @ qh
                for d, sd in zip(docs, s):
                    d = int(d)
                    if sd > best.get(d, -1e30):
                        best[d] = float(sd)
            if not best:
                return np.empty(0, np.int64), np.empty(0, np.float32)
            cand = np.fromiter(best.keys(), np.int64, len(best))
            sco = np.fromiter(best.values(), np.float32, len(best))
            return cand, sco
        return fn

    # ---------------- C: global-exact top-D + signed tail --------------
    def make_global(D, H):
        ded = grank < D  # [DIM] bool: dedicated exact column
        # tail sketch matrix over non-dedicated comps
        w = np.where(mask & ~ded[fc_safe], vals * sign_of(fc_safe), 0.0)
        cols = ((fc_safe.astype(np.uint64) * np.uint64(MULT)) % H).astype(np.int64)
        n_docs, W = fc_safe.shape
        Ht = np.zeros((n_docs, H), np.float32)
        chunk = 65536
        for s0 in range(0, n_docs, chunk):
            e = min(n_docs, s0 + chunk)
            r = np.repeat(np.arange(e - s0, dtype=np.int64), W)
            Ht[s0:e] = np.bincount(
                r * H + cols[s0:e].reshape(-1),
                weights=w[s0:e].reshape(-1),
                minlength=(e - s0) * H).reshape(e - s0, H)

        def fn(qi, qdense, sqc, sqv):
            lists = top_lists(qdense, sqc, sqv)
            cand = np.unique(np.concatenate(
                [posts[lps[c]: lps[c] + ll[c]] for c in lists]
            )) if len(lists) else np.empty(0, np.int64)
            if len(cand) == 0:
                return cand, np.empty(0, np.float32)
            qd_ded = np.zeros(DIM, np.float32)
            dd = ded[sqc]
            qd_ded[sqc[dd]] = sqv[dd]
            s = (qd_ded[fc_safe[cand]] * vals[cand]).sum(1)
            tq = sqc[~dd]
            if len(tq):
                qh = np.zeros(H, np.float32)
                np.add.at(qh, (tq.astype(np.uint64) * np.uint64(MULT)) % H, sqv[~dd] * sign_of(tq))
                s = s + Ht[cand] @ qh
            return cand, s
        return fn

    eval_scheme("A  per-list trunc (baseline)", perlist_fn(0))
    eval_scheme("B  trunc + signed tail H=128", perlist_fn(128))
    eval_scheme("B  trunc + signed tail H=256", perlist_fn(256))
    eval_scheme("C  global D=512 + tail H=512", make_global(512, 512))
    eval_scheme("C  global D=768 + tail H=256", make_global(768, 256))
    eval_scheme("C  global D=896 + tail H=128", make_global(896, 128))


if __name__ == "__main__":
    main()
