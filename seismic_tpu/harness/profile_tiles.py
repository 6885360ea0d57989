"""Per-stage latency attribution for the tiles/Pallas search path.

Times cumulative prefixes of `_tiles_search` as separate jitted programs on
the real device, so the kernel vs XLA-prep vs post-processing split is
measurable (structured replacement for the reference's Instant timers,
SURVEY.md §5).

Each stage function takes the DeviceIndex as a pytree ARGUMENT (capturing
it as a closure constant ships GBs to the remote compiler) and returns a
small reduction of the stage output (syncing a large output would measure
the host tunnel, not the device).

Usage: python -m seismic_tpu.harness.profile_tiles [--batch 1024] [--qc 11]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")


def _sync(out):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default=os.path.join(
        ROOT, ".bench_cache", "index_100000_30522_200_v1024_o64.dir"))
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--qc", type=int, default=11)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..data.sparse import PAD_COMPONENT
    from ..ops.pallas_tiles import score_tiles_pallas
    from ..ops_pallas_prep import ll_pad_for
    from ..search import engine as E
    from ..search.engine import SearchParams, pad_queries
    from ..types import IndexArrays
    from .synth import synth_queries

    print("devices:", jax.devices(), file=sys.stderr)
    arrays = IndexArrays.load(args.index)
    index = arrays.to_device(pallas_tiles=True)
    qc_l, qv_l = synth_queries(args.batch, dim=arrays.dim, seed=11)
    q_comps_np, q_vals_np = pad_queries(qc_l, qv_l, 64)
    q_comps = jnp.asarray(q_comps_np, jnp.int32)
    q_vals = jnp.asarray(q_vals_np, jnp.float32)
    params = SearchParams(
        k=10, query_cut=args.qc, block_budget=0, block_mode="dense",
        doc_mode="tiles", full_lists=True, score_cut=64, dedup_pool=128,
        use_pallas=True,
    )
    B = args.batch
    QC = args.qc
    V = arrays.list_vocab.shape[1]
    LL = ll_pad_for(index.max_list_len)

    def select(ix, qc_arr, qv_arr):
        valid_q = qc_arr != PAD_COMPONENT
        qv = jnp.where(valid_q, qv_arr, 0.0)
        top_vals, top_pos = jax.lax.top_k(qv, QC)
        list_ids = jnp.take_along_axis(qc_arr, top_pos, axis=1)
        sel_valid = jnp.take_along_axis(valid_q, top_pos, axis=1) & (
            list_ids < jnp.int32(ix.list_block_start.shape[0])
        )
        safe_lists = jnp.where(sel_valid, list_ids, 0).astype(jnp.int32)
        return qv, safe_lists, sel_valid

    @jax.jit
    def s1_select(ix, qc_arr, qv_arr):
        qv, safe_lists, sel_valid = select(ix, qc_arr, qv_arr)
        return safe_lists.sum() + qv.sum()

    @jax.jit
    def s2_vocab(ix, qc_arr, qv_arr):
        qv, safe_lists, sel_valid = select(ix, qc_arr, qv_arr)
        vocab = ix.list_vocab[safe_lists].astype(jnp.int32)
        return (vocab & 7).sum()

    @jax.jit
    def s3_qloc(ix, qc_arr, qv_arr):
        qv, safe_lists, sel_valid = select(ix, qc_arr, qv_arr)
        vocab = ix.list_vocab[safe_lists].astype(jnp.int32)
        qloc = E._qloc_compare(vocab, qc_arr, qv, params.score_cut)
        return qloc.sum()

    @jax.jit
    def s4_kernel(ix, qc_arr, qv_arr):
        qv, safe_lists, sel_valid = select(ix, qc_arr, qv_arr)
        vocab = ix.list_vocab[safe_lists].astype(jnp.int32)
        qloc = E._qloc_compare(vocab, qc_arr, qv, params.score_cut)
        tb_idx = ix.list_region_start[safe_lists].reshape(B * QC)
        flat = score_tiles_pallas(
            ix.doc_tiles_aligned, ix.tile_scale3d, tb_idx,
            qloc.reshape(B * QC, V), LL,
            interpret=jax.default_backend() != "tpu",
        )
        return flat.sum()

    @jax.jit
    def s4b_topk(ix, qc_arr, qv_arr):
        qv, safe_lists, sel_valid = select(ix, qc_arr, qv_arr)
        vocab = ix.list_vocab[safe_lists].astype(jnp.int32)
        qloc = E._qloc_compare(vocab, qc_arr, qv, params.score_cut)
        tb_idx = ix.list_region_start[safe_lists].reshape(B * QC)
        flat = score_tiles_pallas(
            ix.doc_tiles_aligned, ix.tile_scale3d, tb_idx,
            qloc.reshape(B * QC, V), LL,
            interpret=jax.default_backend() != "tpu",
        )
        scores = flat.reshape(B, QC, LL)
        lln = ix.list_len[safe_lists]
        pos_mask = (
            (jnp.arange(LL, dtype=jnp.int32) < lln[..., None])
            & sel_valid[..., None]
        )
        scores = jnp.where(pos_mask, scores, -jnp.inf)
        top_scores, pos = jax.lax.top_k(scores.reshape(B, QC * LL), 128)
        return top_scores.sum() + pos.sum()

    @jax.jit
    def s5_full(ix, qc_arr, qv_arr):
        s, i = E._search_impl(
            ix, qc_arr, qv_arr, jnp.float32(0.0), params, 128, 42
        )
        return jnp.where(jnp.isfinite(s), s, 0.0).sum() + i.sum()

    stages = [
        ("1 topk-select", s1_select),
        ("2 +vocab gather", s2_vocab),
        ("3 +qloc einsum", s3_qloc),
        ("4 +pallas kernel", s4_kernel),
        ("4b +mask/pool topk", s4b_topk),
        ("5 full program", s5_full),
    ]
    prev = 0.0
    for name, fn in stages:
        t, _ = _timeit(fn, index, q_comps, q_vals, reps=args.reps)
        print(f"{name:>20}: {t*1e3:8.2f} ms  (delta {1e3*(t-prev):+8.2f} ms)",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
