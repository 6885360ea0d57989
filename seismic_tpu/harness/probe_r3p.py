"""Round-3 probe P (CPU, numpy-only): BLOCK-summary pooling recall —
does mod-V hashing survive at BLOCK granularity?

Per-posting hashed tiles collapsed the pool (probe_r3g/l/m: sketch noise
~ ||q||*||d||/sqrt(V) swamps SPLADE dot margins). Block summaries are a
different regime: one row aggregates <=max_block_len docs (energy-capped
summary, nnz <= max_summary_nnz), the pool ranks BLOCKS, and the tail
exact-rescores every member of the pooled blocks — so block-level
ranking noise is absorbed by a ~block_expand-times-wider exact tail.

Replays block pooling per query on the real cached index:
  candidates = blocks of the top-qc lists
  block score = (a) hashed [V] tile dot (block_pool_arrays math, u8
                quantized) or (b) EXACT summary dot (the reference's
                quantized_summary.rs economics — oracle for (a))
  pool top-`pool` blocks -> expand members (block_start/block_len)
  exact-rescore members -> top-10 recall vs cached GT.

Decides whether probe_r3k/r3j (1M/8.8M lean rungs) can keep the hashed
block tiles or must switch block ranking to the exact dense_summary
path.

Usage: JAX_PLATFORMS=cpu python -m seismic_tpu.harness.probe_r3p \
         [nq] [qc ...]   (BENCH_* env selects the index, as bench.py)
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
    qcuts = [int(a) for a in sys.argv[2:]] or [12, 14]
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
    if arrays.fwd_val_step is not None:
        vals = (vals * np.asarray(arrays.fwd_val_step)[:, None]
                + np.asarray(arrays.fwd_val_min)[:, None])
    vals = np.where(mask, vals, 0.0)
    fc_safe = np.where(mask, fc, 0)
    posts = np.asarray(arrays.postings)
    bs = np.asarray(arrays.block_start, np.int64)
    bl = np.asarray(arrays.block_len, np.int64)
    lbs = np.asarray(arrays.list_block_start, np.int64)
    lnb = np.asarray(arrays.list_n_blocks, np.int64)
    sc_comps = np.asarray(arrays.summary_comps)
    sc_codes = np.asarray(arrays.summary_codes)
    s_min = np.asarray(arrays.summary_min, np.float32)
    s_quant = np.asarray(arrays.summary_quant, np.float32)
    smask = sc_comps != PAD_COMPONENT
    s_vals = np.where(
        smask, s_min[:, None] + sc_codes.astype(np.float32)
        * s_quant[:, None], 0.0)
    sc_safe = np.where(smask, sc_comps, 0)
    DIM = bench.DIM
    print(f"load: {time.time()-t0:.1f}s  ({nq} queries, "
          f"{bench.N_DOCS} docs, {len(bs)} blocks)", flush=True)

    SC, K = 64, 10
    POOLS = (32, 64, 128)

    # hashed block rows for scheme (a), per V
    def hashed_summaries(V):
        cols = np.where(smask, sc_comps % V, 0).astype(np.int64)
        nbp, S = sc_comps.shape
        H = np.zeros((nbp, V), np.float32)
        chunk = 65536
        for s0 in range(0, nbp, chunk):
            e = min(nbp, s0 + chunk)
            r = np.repeat(np.arange(e - s0, dtype=np.int64), S)
            H[s0:e] = np.bincount(
                r * V + cols[s0:e].reshape(-1),
                weights=s_vals[s0:e].reshape(-1),
                minlength=(e - s0) * V).reshape(e - s0, V)
        mx = H.max(axis=1)
        sc = np.maximum(mx, 1e-20) / 255.0
        return np.round(H / sc[:, None]) * sc[:, None]  # u8 round-trip

    schemes = [("exact-summary", None)]
    for V in (512, 1024):
        schemes.append((f"hash{V}", hashed_summaries(V)))

    # dense-summary variant: exact per-entry scores, but only for summary
    # entries inside the list's top-V0 vocab (the builder's dense_summary
    # economics; out-of-vocab summary mass is censored like doc tiles)
    lv = np.asarray(arrays.list_vocab).astype(np.int64)
    vr = np.asarray(arrays.vocab_rank)
    V_BUILD = lv.shape[1]
    blk_list = np.zeros(len(bs), np.int64)
    for li in range(len(lbs)):
        if lnb[li]:
            blk_list[lbs[li]: lbs[li] + lnb[li]] = li
    for V0 in (V_BUILD, 512):
        schemes.append((f"dense{V0}", ("dense", V0)))

    for label, H in schemes:
        for QC in qcuts:
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
                sqc, sqv = qc_[topq], qv_[topq]
                qd_top = np.zeros(DIM, np.float32)
                qd_top[sqc] = sqv
                lists = sqc[np.argsort(-sqv, kind="stable")[:QC]]
                blocks = np.concatenate([
                    np.arange(lbs[li], lbs[li] + lnb[li])
                    for li in lists if lnb[li] > 0
                ]) if len(lists) else np.empty(0, np.int64)
                gset = {int(x) for x in gt[qi][:K] if x >= 0}
                tot += len(gset)
                if len(blocks) == 0:
                    continue
                if H is None:
                    bsc = (qd_top[sc_safe[blocks]]
                           * s_vals[blocks]).sum(1)
                elif isinstance(H, tuple):
                    V0 = H[1]
                    # per scanned list: query restricted to the list's
                    # top-V0 vocab, applied to the exact summary entries
                    bsc = np.zeros(len(blocks), np.float32)
                    for li in lists:
                        if lnb[li] == 0:
                            continue
                        sel = (lv[li][vr[li] < V0]
                               if V0 < V_BUILD else lv[li])
                        vm = np.zeros(DIM, bool)
                        vm[sel[sel >= 0]] = True
                        bsel = (blk_list[blocks] == li)
                        bb = blocks[bsel]
                        bsc[bsel] = ((qd_top * vm)[sc_safe[bb]]
                                     * s_vals[bb]).sum(1)
                else:
                    qh = np.zeros(H.shape[1], np.float32)
                    np.add.at(qh, sqc % H.shape[1], sqv)
                    bsc = H[blocks] @ qh
                order_ = np.argsort(-bsc, kind="stable")
                for pool in POOLS:
                    top_b = blocks[order_[:pool]]
                    mem = np.concatenate([
                        posts[bs[b]: bs[b] + bl[b]] for b in top_b
                    ])
                    mem = np.unique(mem)
                    exact = (qdense[fc_safe[mem]] * vals[mem]).sum(1)
                    topk = mem[np.argsort(-exact, kind="stable")[:K]]
                    rec[pool] += len(gset & {int(x) for x in topk})
            line = "  ".join(
                f"pool{p}={rec[p]/max(tot,1):.4f}" for p in POOLS)
            print(f"{label:14s} qc={QC}: {line}  ({time.time()-t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
