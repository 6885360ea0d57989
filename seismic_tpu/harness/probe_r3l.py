"""Round-3 probe L (CPU, numpy-only): why hashed tiles lose recall at
bench scale, and whether SIGNED hashing (count-sketch) fixes it.

probe_r3g's first TPU grid showed hash1024 recall@10 collapsing to
0.55-0.67 (pool64-128) vs 0.9725 for truncated tiles — and recall
FALLING as more lists are scanned. Diagnosis: the unsigned mod-V sum is
an upper bound whose collision bias grows with doc nnz, so
collision-inflated impostors crowd the fixed-size candidate pool and
push true top-k docs below the cut. The classic repair is the
count-sketch estimator (Charikar et al. 2002): give every component a
deterministic sign s(c) in {+1,-1}; collision terms then cancel in
expectation and the sketch becomes an unbiased estimate with
O(|q||d|/V) variance instead of a positively biased bound.

This probe replays the grouped pipeline's pooling math in numpy on the
REAL cached bench index (.bench_cache/index_100000_*), per query:
  candidates = union of postings of the top-qc lists
  pool       = top-`pool` candidates by sketch score (u8/i8 row codes,
               i8 query codes — the kernel's quantization included)
  rescore    = exact forward dots on the top-`rescore` of the pool
  recall@10  vs the cached exact GT.
The union pool is slightly optimistic vs the device's hier16 pool, but
identically so for every scheme — it ranks schemes, the TPU grid
calibrates the winner.

Schemes: unsigned V=1024 (repro of r3g), signed V=1024/512/256, and
min-of-2 unsigned V=512 (count-min flavor that preserves upper bounds).

Usage: JAX_PLATFORMS=cpu python -m seismic_tpu.harness.probe_r3l [nq]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)

MULT = np.uint32(0x9E3779B1)  # Fibonacci hashing multiplier


def sign_of(comps: np.ndarray) -> np.ndarray:
    """Deterministic +-1 per component id (bit 15 of a multiplicative
    hash) — reproducible in JAX as uint32 ops for the query side."""
    h = comps.astype(np.uint32) * MULT
    return np.where((h >> np.uint32(15)) & np.uint32(1) == 1,
                    np.float32(1.0), np.float32(-1.0))


def bucket2_of(comps: np.ndarray, V: int) -> np.ndarray:
    """Second independent bucket map for the min-of-2 scheme."""
    h = comps.astype(np.uint32) * MULT
    return ((h >> np.uint32(7)).astype(np.int64)) % V


def hash_doc_matrix(fc, vals, mask, V, signed, bucket2=False,
                    chunk=65536):
    n_docs, W = fc.shape
    cols = bucket2_of(fc, V) if bucket2 else (
        np.where(mask, fc % V, 0).astype(np.int64))
    cols = np.where(mask, cols, 0)
    w = vals * sign_of(fc) if signed else vals
    w = np.where(mask, w, 0.0)
    H = np.zeros((n_docs, V), np.float32)
    for s in range(0, n_docs, chunk):
        e = min(n_docs, s + chunk)
        r = np.repeat(np.arange(e - s, dtype=np.int64), W)
        flat = r * V + cols[s:e].reshape(-1)
        H[s:e] = np.bincount(flat, weights=w[s:e].reshape(-1),
                             minlength=(e - s) * V).reshape(e - s, V)
    return H


def quantize_rows(H, signed):
    """Per-row code quantization as the device tiles do: u8 ceil-style
    for non-negative rows, symmetric i8 for signed rows."""
    if signed:
        mx = np.abs(H).max(axis=1)
        sc = np.maximum(mx, 1e-20) / 127.0
        codes = np.round(H / sc[:, None]).astype(np.int8)
    else:
        mx = H.max(axis=1)
        sc = np.maximum(mx, 1e-20) / 255.0
        codes = np.round(H / sc[:, None]).astype(np.uint8)
    return codes.astype(np.float32) * sc[:, None]


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 512
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
    print(f"load: {time.time()-t0:.1f}s  ({nq} queries)", flush=True)

    fc = np.asarray(arrays.fwd_comps)
    mask = fc != PAD_COMPONENT
    vals = np.asarray(arrays.fwd_vals).astype(np.float32)
    if arrays.fwd_val_step is not None:
        vals = (vals * np.asarray(arrays.fwd_val_step)[:, None]
                + np.asarray(arrays.fwd_val_min)[:, None])
    vals = np.where(mask, vals, 0.0)
    fc_safe = np.where(mask, fc, 0)  # pad slots carry 0.0 in `vals`
    lps = np.asarray(arrays.list_post_start, np.int64)
    ll = np.asarray(arrays.list_len, np.int64)
    posts = np.asarray(arrays.postings)

    QC, SC, K = 11, 64, 10

    def run_scheme(label, V, signed, nmin=1, pools=((64, 48), (128, 96)),
                   quant=True):
        t0 = time.time()
        Hs = []
        for j in range(nmin):
            H = hash_doc_matrix(fc, vals, mask, V, signed, bucket2=j == 1)
            Hs.append(quantize_rows(H, signed) if quant else H)
        build_s = time.time() - t0
        rec = {p: 0 for p in pools}
        tot = 0
        for qi in range(nq):
            qc, qv = q_comps[qi], q_vals[qi]
            valid = qc != PAD_COMPONENT
            qc, qv = qc[valid], qv[valid]
            # selected lists: top-QC by query value
            top = np.argsort(-qv, kind="stable")[:QC]
            cand = np.unique(np.concatenate([
                posts[lps[c]: lps[c] + ll[c]] for c in qc[top]
            ])) if len(top) else np.empty(0, np.int64)
            if len(cand) == 0:
                tot += K
                continue
            # sketch scores with the kernel's query-side i8 quantization
            topq = np.argsort(-qv, kind="stable")[:SC]
            sqc, sqv = qc[topq], qv[topq]
            sco = np.zeros(len(cand), np.float32)
            for j in range(nmin):
                qh = np.zeros(V, np.float32)
                colsq = (bucket2_of(sqc, V) if j == 1
                         else (sqc.astype(np.int64) % V))
                w = sqv * sign_of(sqc) if signed else sqv
                np.add.at(qh, colsq, w)
                if quant:
                    qsc = max(np.abs(qh).max(), 1e-20) / 127.0
                    qh = np.round(qh / qsc) * qsc
                s_j = Hs[j][cand] @ qh
                sco = s_j if j == 0 else np.minimum(sco, s_j)
            order = np.argsort(-sco, kind="stable")
            # exact rescore of the top-`rescore` of each pool
            gset = {int(x) for x in gt[qi][:K] if x >= 0}
            tot += len(gset)
            for pool, resc in pools:
                sel = cand[order[:pool][:resc]]
                qdense = np.zeros(bench.DIM, np.float32)
                qdense[qc] = qv
                exact = (qdense[fc_safe[sel]] * vals[sel]).sum(axis=1)
                topk = sel[np.argsort(-exact, kind="stable")[:K]]
                rec[(pool, resc)] += len(gset & {int(x) for x in topk})
        for pool, resc in pools:
            print(f"{label:24s} pool{pool}/r{resc}: "
                  f"recall@10={rec[(pool, resc)]/max(tot,1):.4f}  "
                  f"(H build {build_s:.0f}s)", flush=True)

    run_scheme("unsigned V=1024 (r3g)", 1024, signed=False)
    run_scheme("signed   V=1024", 1024, signed=True)
    run_scheme("signed   V=512", 512, signed=True)
    run_scheme("signed   V=256", 256, signed=True)
    run_scheme("min2 uns V=512", 512, signed=False, nmin=2)
    run_scheme("signed   V=1024 noquant", 1024, signed=True, quant=False)


if __name__ == "__main__":
    main()
