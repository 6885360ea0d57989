"""Per-stage latency profiling of the search program on real hardware.

Times each pipeline stage as its own jitted function (block ranking,
candidate windows, coarse ranking, exact scoring, dedup+topk) so HBM /
gather bottlenecks are attributable. This is the structured replacement for
the reference's ad-hoc Instant timers (SURVEY.md §5).

Usage: python -m seismic_tpu.harness.profile_stages --index ... --batch 256
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np


def _sync(out):
    """Force real completion: on the axon remote platform
    jax.block_until_ready returns before execution finishes, so materialize
    one output element on the host."""
    import jax

    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "shape")]
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]
    return out


def _timeit(fn, *args, reps=5):
    _sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / reps, out


def profile(arrays, q_comps, q_vals, query_cut=20, block_budget=256,
            heap_factor=0.4, k=10, reps=5):
    import jax
    import jax.numpy as jnp

    from ..data.sparse import PAD_COMPONENT
    from ..search import engine as E

    index = arrays.to_device()
    B, Q = q_comps.shape
    dim = index.dim
    MB = max(index.max_blocks_per_list, 1)
    Lmax = max(index.max_block_len, 1)
    QC = min(query_cut, Q)
    n_docs = index.n_docs
    sentinel_block = index.block_start.shape[0] - 1
    results = {}

    q_comps = jnp.asarray(q_comps, jnp.int32)
    q_vals = jnp.asarray(q_vals, jnp.float32)
    hf = jnp.float32(heap_factor)

    @jax.jit
    def stage_prep(index, q_comps, q_vals):
        valid_q = q_comps != PAD_COMPONENT
        qv = jnp.where(valid_q, q_vals, 0.0)
        qd = E.densify_query_batch(q_comps, qv, dim)
        top_vals, top_pos = jax.lax.top_k(qv, QC)
        list_ids = jnp.take_along_axis(q_comps, top_pos, axis=1)
        sel_valid = jnp.take_along_axis(valid_q, top_pos, axis=1)
        safe_lists = jnp.where(sel_valid, list_ids, 0).astype(jnp.int32)
        return qd, safe_lists, sel_valid

    t, (qd, safe_lists, sel_valid) = _timeit(stage_prep, index, q_comps,
                                             q_vals, reps=reps)
    results["1_prep_densify_topcut"] = t

    @jax.jit
    def stage_blocks(index, qd, safe_lists, sel_valid):
        lbs = index.list_block_start[safe_lists]
        lnb = index.list_n_blocks[safe_lists]
        steps = jnp.arange(MB, dtype=jnp.int32)
        block_ids = lbs[..., None] + steps
        bmask = (steps < lnb[..., None]) & sel_valid[..., None]
        block_ids = jnp.where(bmask, block_ids, sentinel_block)
        V = index.list_vocab.shape[1]
        vocab = index.list_vocab[safe_lists]
        qloc = jax.vmap(E._lookup)(qd, vocab)

        def score_list(lbs_scalar, qloc_vec):
            tile = jax.lax.dynamic_slice(
                index.dense_summary, (lbs_scalar, 0), (MB, V))
            scale = jax.lax.dynamic_slice(
                index.dense_scale, (lbs_scalar,), (MB,))
            return jnp.dot(tile.astype(jnp.float32), qloc_vec,
                           preferred_element_type=jnp.float32) * scale

        scores = jax.vmap(jax.vmap(score_list))(lbs, qloc)
        scores = scores.reshape(B, QC * MB)
        scores = jnp.where(bmask.reshape(B, QC * MB), scores, -jnp.inf)
        return scores, block_ids.reshape(B, QC * MB)

    t, (block_scores, block_ids) = _timeit(
        stage_blocks, index, qd, safe_lists, sel_valid, reps=reps)
    results["2_block_ranking_dense"] = t

    BE = min(block_budget, QC * MB)

    @jax.jit
    def stage_select(index, block_scores, block_ids, hf):
        tbs, tbp = jax.lax.top_k(block_scores, BE)
        sel_blocks = jnp.take_along_axis(block_ids, tbp, axis=1)
        theta = tbs[:, min(k, BE) - 1]
        thr = jnp.where(jnp.isfinite(theta), hf * theta, -jnp.inf)
        eval_mask = jnp.isfinite(tbs) & (tbs >= thr[:, None])
        return jnp.where(eval_mask, sel_blocks, sentinel_block), eval_mask

    t, (sel_blocks, eval_mask) = _timeit(
        stage_select, index, block_scores, block_ids, hf, reps=reps)
    results["3_block_topk_select"] = t

    @jax.jit
    def stage_windows(index, sel_blocks, eval_mask):
        starts = index.block_start[sel_blocks]
        lens = index.block_len[sel_blocks]
        cand = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(index.postings, (s,), (Lmax,))
        ))(starts)
        cmask = (jnp.arange(Lmax, dtype=jnp.int32) < lens[..., None]) \
            & eval_mask[..., None]
        cand = jnp.where(cmask, cand, n_docs).reshape(B, BE * Lmax)
        return cand, cmask.reshape(B, BE * Lmax)

    t, (cand_ids, cmask) = _timeit(stage_windows, index, sel_blocks,
                                   eval_mask, reps=reps)
    results["4_candidate_windows"] = t
    NC = BE * Lmax

    if index.doc_sketch is not None:
        from ..ops.sketch import sketch_padded_queries

        @jax.jit
        def stage_coarse(index, cand_ids, cmask, q_comps, q_vals):
            safe = jnp.minimum(cand_ids, n_docs - 1)
            dsk = index.doc_sketch[safe]
            dscale = index.doc_sketch_scale[safe]
            q_sk = sketch_padded_queries(q_comps, q_vals, 128, 42)
            coarse = jnp.einsum("bnd,bd->bn", dsk.astype(jnp.float32), q_sk,
                                preferred_element_type=jnp.float32) * dscale
            return jnp.where(cmask, coarse, -jnp.inf)

        t, _ = _timeit(stage_coarse, index, cand_ids, cmask, q_comps,
                       q_vals, reps=reps)
        results["5_coarse_sketch_all_cands"] = t

    @jax.jit
    def stage_exact(index, qd, cand_ids, cmask):
        safe = jnp.minimum(cand_ids, n_docs - 1)
        scores = E._exact_scores(index, qd, safe)
        return jnp.where(cmask, scores, -jnp.inf)

    t, scores = _timeit(stage_exact, index, qd, cand_ids, cmask, reps=reps)
    results["6_exact_scoring"] = t

    @jax.jit
    def stage_final(scores, cand_ids):
        s, ids = E._dedup_by_id(scores, cand_ids, n_docs)
        ts, pos = jax.lax.top_k(s, k)
        return ts, jnp.take_along_axis(ids, pos, axis=1)

    t, _ = _timeit(stage_final, scores, cand_ids, reps=reps)
    results["7_dedup_topk"] = t

    results["_meta"] = dict(B=B, QC=QC, MB=MB, BE=BE, Lmax=Lmax, NC=NC,
                            W=int(index.fwd_comps.shape[1]), dim=dim)
    return results


def profile_tiles(arrays, q_comps, q_vals, query_cut=10, score_cut=64,
                  k=10, reps=5):
    """Stage timings for the tiles (streaming) search mode."""
    import jax
    import jax.numpy as jnp

    from ..data.sparse import PAD_COMPONENT
    from ..search import engine as E

    index = arrays.to_device()
    B, Q = q_comps.shape
    QC = min(query_cut, Q)
    V = index.list_vocab.shape[1]
    LL = max(index.max_list_len, 1)
    n_docs = index.n_docs
    results = {}
    q_comps = jnp.asarray(q_comps, jnp.int32)
    q_vals = jnp.asarray(q_vals, jnp.float32)

    @jax.jit
    def s1(index, q_comps, q_vals):
        valid = q_comps != PAD_COMPONENT
        qv = jnp.where(valid, q_vals, 0.0)
        tv, tp = jax.lax.top_k(qv, QC)
        lists = jnp.take_along_axis(q_comps, tp, axis=1)
        selv = jnp.take_along_axis(valid, tp, axis=1)
        return jnp.where(selv, lists, 0).astype(jnp.int32), selv, qv

    t, (safe_lists, selv, qv) = _timeit(s1, index, q_comps, q_vals, reps=reps)
    results["1_term_select"] = t

    @jax.jit
    def s2(index, safe_lists):
        return index.list_vocab[safe_lists]

    t, vocab = _timeit(s2, index, safe_lists, reps=reps)
    results["2_vocab_gather"] = t

    @jax.jit
    def s3(vocab, q_comps, qv):
        return E._qloc_compare(vocab, q_comps, qv, score_cut)

    t, qloc = _timeit(s3, vocab, q_comps, qv, reps=reps)
    results["3_qloc_compare"] = t

    @jax.jit
    def s4(index, safe_lists, qloc):
        lps = index.list_post_start[safe_lists]

        def one(start, qvv):
            tile = jax.lax.dynamic_slice(index.doc_tiles, (start, 0), (LL, V))
            scale = jax.lax.dynamic_slice(
                index.doc_tile_scale, (start,), (LL,))
            return jnp.dot(tile.astype(jnp.float32), qvv,
                           preferred_element_type=jnp.float32) * scale

        return jax.vmap(jax.vmap(one))(lps, qloc), lps

    t, (scores, lps) = _timeit(s4, index, safe_lists, qloc, reps=reps)
    results["4_tile_slice_matmul"] = t

    pool = max(8 * k, 64)

    @jax.jit
    def s5(index, scores, lps, selv):
        lln = index.list_len[safe_lists]
        mask = (jnp.arange(LL, dtype=jnp.int32) < lln[..., None]) \
            & selv[..., None]
        flat = jnp.where(mask, scores, -jnp.inf).reshape(B, QC * LL)
        ts, pos = jax.lax.top_k(flat, pool)
        qslot = pos // LL
        off = pos % LL
        pidx = jnp.take_along_axis(lps, qslot, axis=1) + off
        ids = jnp.take(index.postings,
                       jnp.minimum(pidx, index.postings.shape[0] - 1))
        ids = jnp.where(jnp.isfinite(ts), ids, n_docs)
        ds_, di_ = E._dedup_by_id(ts, ids, n_docs)
        fs, fp = jax.lax.top_k(ds_, k)
        return fs, jnp.take_along_axis(di_, fp, axis=1)

    t, _ = _timeit(s5, index, scores, lps, selv, reps=reps)
    results["5_topk_ids_dedup"] = t
    results["_meta"] = dict(B=B, QC=QC, V=V, LL=LL, pool=pool)
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--query-cut", type=int, default=20)
    p.add_argument("--block-budget", type=int, default=256)
    p.add_argument("--n-queries", type=int, default=256)
    p.add_argument("--dim", type=int, default=30522)
    p.add_argument("--tiles", action="store_true",
                   help="profile the tiles search mode")
    args = p.parse_args(argv)

    from ..harness.synth import synth_queries
    from ..search.engine import pad_queries
    from ..types import IndexArrays

    arrays = IndexArrays.load(args.index)
    qc, qv = synth_queries(args.batch, dim=args.dim, seed=11)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    if args.tiles:
        res = profile_tiles(arrays, q_comps, q_vals,
                            query_cut=args.query_cut)
    else:
        res = profile(arrays, q_comps, q_vals, query_cut=args.query_cut,
                      block_budget=args.block_budget)
    meta = res.pop("_meta")
    print("meta:", meta)
    total = 0.0
    for name in sorted(res):
        print(f"{name:32s} {res[name]*1e3:9.2f} ms/batch "
              f"{res[name]/meta['B']*1e6:9.1f} us/query")
        total += res[name]
    print(f"{'TOTAL':32s} {total*1e3:9.2f} ms/batch "
          f"{total/meta['B']*1e6:9.1f} us/query")
    return 0


if __name__ == "__main__":
    sys.exit(main())
