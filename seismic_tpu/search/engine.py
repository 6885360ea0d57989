"""The jitted batched search program.

TPU-native re-design of the reference query path
(reference: src/inverted_index.rs:153-234, src/posting_list.rs:115-215,
src/quantized_summary.rs:64-160). The sequential heap-and-skip loop becomes
a fixed-shape, fully vectorized pipeline — one XLA program per (batch,
static-params) signature, vmapped over the query batch:

  1. top-`query_cut` query terms        -> lax.top_k         (k_largest_by)
  2. selected lists' block windows      -> contiguous gathers (block_offsets)
  3. block ranking                      -> int8 sketch matmul (fast mode) or
                                           u8 summary dequant + dense-query
                                           gather (exact mode; `distances`)
  4. heap_factor pruning + block budget -> masked top_k      (block skipping)
  5. candidate doc windows              -> batched dynamic slices (postings)
  6. coarse candidate ranking           -> int8 doc-sketch matmul (optional)
  7. exact scoring                      -> forward-tile gather + dense-query
                                           gather, f32 accumulate
  8. dedup + final top-k                -> sort-by-id mask    (visited set)
  9. optional k-NN refinement           -> neighbor gather + one more round

The adaptive `heap_factor` block skip (posting_list.rs:130) is approximated
by masking blocks whose summary score falls below `heap_factor` times the
k-th best block score — a static-shape analogue of "skip if it cannot beat
the current k-th result".
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..data.sparse import PAD_COMPONENT
from ..ops.sketch import sketch_padded_queries
from ..types import DeviceIndex


@dataclass(frozen=True)
class SearchParams:
    """Static (compile-time) search parameters."""

    k: int = 10
    query_cut: int = 10
    # Blocks fully evaluated per query (the static analogue of how many
    # blocks survive the reference's skip test). 0 = all selected blocks.
    block_budget: int = 48
    # Candidates exactly scored after coarse sketch ranking. 0 = all.
    cand_budget: int = 0
    # "dense" ranks blocks with the per-list local-vocab u8 matmul (fast,
    # exact up to the vocab cap); "summary" uses the u8 CSR summaries
    # (parity mode); "sketch" is the experimental CountSketch ranker.
    block_mode: str = "dense"
    # Document scoring path:
    #   "gather" — gather forward-index rows, score against the dense query
    #              (exact; random access, slow on gather-weak devices);
    #   "tiles"  — stream the replicated block-aligned dense doc tiles and
    #              score on the MXU (contiguous; exact w.r.t. the list-vocab
    #              restriction + u8 quantization). Requires doc_tiles;
    #   "rescore" — the memory-parity path: every candidate of the
    #              surviving blocks is exact-scored by the Pallas rescore
    #              kernel (wide-row forward gathers + in-VMEM compare);
    #              needs NO doc tiles and NO sketches — the reference's
    #              evaluate_posting_block economics (posting_list.rs:188-215)
    #              at ~2x-forward-index memory.
    doc_mode: str = "gather"
    # In tiles mode: score every posting of the selected lists (ignores the
    # block structure entirely; highest recall for a given query_cut).
    full_lists: bool = True
    # Number of top query terms participating in scoring stages (tiles /
    # dense-summary ranking). Full exactness needs >= the query's nnz.
    score_cut: int = 64
    n_knn: int = 0
    # Accepted for API parity; block evaluation order is data-independent in
    # the batched design, so this has no effect (see module docstring).
    first_sorted: bool = False
    # Pool size for the dedup stage in tiles mode (top candidates kept
    # before duplicate removal); 0 = 8 * k.
    dedup_pool: int = 0
    # Use the Pallas fused tile scorer (requires an index uploaded with
    # to_device(pallas_tiles=True) and full_lists; falls back to the XLA
    # formulation otherwise).
    use_pallas: bool = False


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------


def densify_query_batch(q_comps, q_vals, dim: int):
    """[B, Q] padded queries -> [B, dim + 1] dense; slot `dim` stays 0 so
    clipped PAD_COMPONENT lookups read 0."""
    B = q_comps.shape[0]
    qd = jnp.zeros((B, dim + 1), dtype=jnp.float32)
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], q_comps.shape)
    comps = jnp.minimum(q_comps, dim)
    # Out-of-vocabulary components (>= dim, e.g. query-only tokens) must not
    # leak into the zero slot that padded doc-tile lookups read.
    vals = jnp.where(q_comps >= dim, 0.0, q_vals.astype(jnp.float32))
    return qd.at[rows, comps].add(vals, mode="drop")


def _lookup(qd_row, comps):
    """qd gather with PAD clipping to the zero slot."""
    dim = qd_row.shape[-1] - 1
    idx = jnp.minimum(comps.astype(jnp.int32), dim)
    return jnp.take(qd_row, idx.reshape(-1), axis=0).reshape(comps.shape)


def _decode_fwd_vals(index: DeviceIndex, tiles_vals, tiles_comps, doc_ids):
    """Decode gathered forward-value tiles to f32 (handles the u8 variant).
    `tiles_comps` may be the int32 comps (PAD_COMPONENT padded) or a
    precomputed validity mask (bool)."""
    if tiles_comps.dtype == jnp.bool_:
        mask = tiles_comps
    else:
        mask = tiles_comps != PAD_COMPONENT
    if index.fwd_val_min is not None:
        mins = index.fwd_val_min[doc_ids]
        steps = index.fwd_val_step[doc_ids]
        vals = (
            tiles_vals.astype(jnp.float32) * steps[..., None]
            + mins[..., None]
        )
    else:
        vals = tiles_vals.astype(jnp.float32)
    return jnp.where(mask, vals, 0.0)


def _dedup_by_id(scores, ids, n_docs: int):
    """Sort candidates by (id, score desc), mask duplicates keeping each
    id's best score (the `visited` set, posting_list.rs:206-214 — except
    the reference scores a doc once; we may score a doc under several list
    projections and keep the max). Returns (scores, ids), dups at -inf."""
    ids = jnp.where(jnp.isfinite(scores), ids, n_docs)
    neg = jnp.where(jnp.isfinite(scores), -scores, jnp.inf)
    ids_sorted, neg_sorted = jax.lax.sort(
        (ids.astype(jnp.int32), neg), dimension=-1, num_keys=2
    )
    scores_sorted = -neg_sorted
    dup = jnp.concatenate(
        [
            jnp.zeros_like(ids_sorted[..., :1], dtype=bool),
            ids_sorted[..., 1:] == ids_sorted[..., :-1],
        ],
        axis=-1,
    )
    invalid = ids_sorted >= n_docs
    scores_sorted = jnp.where(dup | invalid, -jnp.inf, scores_sorted)
    return scores_sorted, ids_sorted


def _qloc_compare(vocab, q_comps, q_vals, score_cut: int):
    """Project queries onto per-list local vocabularies without gathers:
    qloc[b, l, v] = sum_i qv_i * [vocab[b, l, v] == qc_i], over the query's
    top-`score_cut` terms (fused one-hot compare; MXU/VPU friendly)."""
    sc = min(score_cut, q_vals.shape[1])
    top_v, top_p = jax.lax.top_k(q_vals, sc)
    top_c = jnp.take_along_axis(q_comps, top_p, axis=1)  # [B, sc]
    eq = (vocab[..., None] == top_c[:, None, None, :]).astype(jnp.float32)
    return jnp.einsum(
        "bqvi,bi->bqv", eq, top_v, preferred_element_type=jnp.float32
    )


def _exact_scores(index: DeviceIndex, qd, doc_ids, chunk: int = 1024):
    """Exact dot products of `doc_ids` [B, N] against the dense queries.

    This is the TPU replacement of `evaluate_posting_block`'s
    prefetch + sparse-merge (posting_list.rs:188-215): contiguous row
    gathers of padded doc tiles + a dense-query table lookup, f32 accumulate.
    Large candidate sets are scored in sequential chunks to bound the
    [B, chunk, W] gathered-tile working set.
    """
    B, N = doc_ids.shape
    if N <= chunk:
        return _exact_scores_block(index, qd, doc_ids)
    n_chunks = -(-N // chunk)
    padded = n_chunks * chunk
    ids = jnp.pad(doc_ids, ((0, 0), (0, padded - N)))
    ids = ids.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    out = jax.lax.map(lambda c: _exact_scores_block(index, qd, c), ids)
    return out.transpose(1, 0, 2).reshape(B, padded)[:, :N]


def _exact_scores_block(index: DeviceIndex, qd, doc_ids):
    if getattr(index, "fwd_fused16", None) is not None:
        # half-width fused tile: (comp i16 << 16) | f16-bit value per
        # i32 word (to_device(fwd_f16=True)); pad decodes to -1 / +0.0
        packed = index.fwd_fused16[doc_ids]  # i32 [B, N, W]
        tiles_comps = jax.lax.shift_right_arithmetic(packed, 16)
        tiles_vals = _decode_fwd_vals(
            index,
            jax.lax.bitcast_convert_type(
                (packed & 0xFFFF).astype(jnp.uint16), jnp.float16
            ).astype(jnp.float32),
            tiles_comps >= 0, doc_ids,
        )
    elif getattr(index, "fwd_fused", None) is not None:
        # fused [n_docs, 2W] tile: one row gather (the fused layout
        # supersedes fwd_comps/fwd_vals on device to save HBM)
        fused = index.fwd_fused[doc_ids]  # i32 [B, N, 2W]
        W2 = fused.shape[-1] // 2
        tiles_comps = fused[..., :W2]
        tiles_vals = _decode_fwd_vals(
            index,
            jax.lax.bitcast_convert_type(fused[..., W2:], jnp.float32),
            tiles_comps, doc_ids,
        )
    else:
        tiles_comps = index.fwd_comps[doc_ids]  # [B, N, W]
        tiles_vals = _decode_fwd_vals(
            index, index.fwd_vals[doc_ids], tiles_comps, doc_ids
        )
    qvals = jax.vmap(_lookup)(qd, tiles_comps)  # [B, N, W]
    return jnp.sum(tiles_vals * qvals, axis=-1)


# ---------------------------------------------------------------------------
# Tiles-mode search: contiguous streaming + MXU (no random row gathers)
# ---------------------------------------------------------------------------


def _tiles_search(
    index: DeviceIndex,
    params: SearchParams,
    q_comps,
    q_vals,
    safe_lists,  # [B, QC] int32
    sel_valid,  # [B, QC] bool
    heap_factor,
):
    """Score the selected lists' replicated dense doc tiles on the MXU.

    Replaces the reference's block-scan + forward-index random access
    (posting_list.rs:115-215) with per-list contiguous slices: every posting
    occurrence carries a dense u8 row over the list's local vocabulary, so
    candidate scoring is [list_len, V] @ qloc matmuls. With
    `full_lists=False` the dense summaries prune whole blocks first
    (heap_factor semantics); with `full_lists=True` every posting of the
    selected lists is scored (the exhaustive-scan limit of the reference's
    heap_factor -> 0).
    """
    B, QC = safe_lists.shape
    n_docs = index.n_docs
    V = index.list_vocab.shape[1]
    LL = max(index.max_list_len, 1)
    MB = max(index.max_blocks_per_list, 1)
    k = params.k

    vocab = index.list_vocab[safe_lists].astype(jnp.int32)  # [B, QC, V]
    qloc = _qloc_compare(vocab, q_comps, q_vals, params.score_cut)

    lps = index.list_post_start[safe_lists]  # [B, QC]
    lln = index.list_len[safe_lists]

    def score_list(start, qv_vec):
        tile = jax.lax.dynamic_slice(index.doc_tiles, (start, 0), (LL, V))
        scale = jax.lax.dynamic_slice(index.doc_tile_scale, (start,), (LL,))
        return (
            jnp.dot(
                tile.astype(jnp.float32),
                qv_vec,
                preferred_element_type=jnp.float32,
            )
            * scale
        )

    use_pallas = (
        (params.use_pallas or index.doc_tiles is None)
        and index.doc_tiles_aligned is not None
    )
    if use_pallas:
        from ..ops.pallas_tiles import GROUP, score_tiles_pallas
        from ..ops_pallas_prep import ll_pad_for

        if index.tile_csub != 1:
            raise ValueError(
                "the engine tiles path requires a tile_csub=1 aligned "
                "layout; csub>1 uploads serve the grouped path only"
            )
        LL = ll_pad_for(index.max_list_len)
        BQ = B * QC
        # The kernel grid requires BQ % GROUP == 0; pad extra rows against
        # region 0 (always valid memory) with zero query projections and
        # slice them off. Keeps the Pallas path total: an index uploaded
        # with pallas_tiles=True has no doc_tiles for the XLA branch.
        BQ_pad = -(-BQ // GROUP) * GROUP
        tb_idx = index.list_region_start[safe_lists].reshape(BQ)
        qloc_flat = qloc.reshape(BQ, V)
        if BQ_pad != BQ:
            tb_idx = jnp.pad(tb_idx, (0, BQ_pad - BQ))
            qloc_flat = jnp.pad(qloc_flat, ((0, BQ_pad - BQ), (0, 0)))
        flat = score_tiles_pallas(
            index.doc_tiles_aligned,
            index.tile_scale3d,
            tb_idx,
            qloc_flat,
            LL,
            interpret=jax.default_backend() != "tpu",
        )
        scores = flat[:BQ].reshape(B, QC, LL)
    else:
        # Sequential over the query_cut axis: bounds the materialized
        # sliced tiles to [B, LL, V] per step (vmapping both axes would
        # materialize [B, QC, LL, V], which OOMs at large query_cut).
        def qc_step(_, inputs):
            lps_col, qloc_col = inputs  # [B], [B, V]
            return None, jax.vmap(score_list)(lps_col, qloc_col)

        _, scores_t = jax.lax.scan(
            qc_step, None, (lps.T, jnp.transpose(qloc, (1, 0, 2)))
        )
        scores = jnp.transpose(scores_t, (1, 0, 2))  # [B, QC, LL]
    pos_mask = (
        (jnp.arange(LL, dtype=jnp.int32) < lln[..., None])
        & sel_valid[..., None]
    )

    if not params.full_lists:
        # Block-level pruning: rank blocks by their dense summaries, apply
        # the heap_factor skip (posting_list.rs:130), and mask postings of
        # skipped blocks via the per-posting local block index.
        lbs = index.list_block_start[safe_lists]
        lnb = index.list_n_blocks[safe_lists]

        def block_scores_one(bstart, qv_vec):
            tile = jax.lax.dynamic_slice(
                index.dense_summary, (bstart, 0), (MB, V)
            )
            scale = jax.lax.dynamic_slice(
                index.dense_scale, (bstart,), (MB,)
            )
            return (
                jnp.dot(
                    tile.astype(jnp.float32),
                    qv_vec,
                    preferred_element_type=jnp.float32,
                )
                * scale
            )

        bscores = jax.vmap(jax.vmap(block_scores_one))(lbs, qloc)
        steps = jnp.arange(MB, dtype=jnp.int32)
        bvalid = (steps < lnb[..., None]) & sel_valid[..., None]
        bscores = jnp.where(bvalid, bscores, -jnp.inf)
        flat_b = bscores.reshape(B, QC * MB)
        BE = min(
            params.block_budget if params.block_budget > 0 else QC * MB,
            QC * MB,
        )
        tbs, _ = jax.lax.top_k(flat_b, BE)
        theta = tbs[:, min(k, BE) - 1]
        thr = jnp.where(jnp.isfinite(theta), heap_factor * theta, -jnp.inf)
        cutoff = jnp.minimum(thr, tbs[:, BE - 1])  # budget + heap factor
        keep_block = bscores >= cutoff[:, None, None]  # [B, QC, MB]

        def post_block_one(start):
            return jax.lax.dynamic_slice(
                index.posting_block_local, (start,), (LL,)
            )

        pblock = jax.vmap(jax.vmap(post_block_one))(lps)  # [B, QC, LL]
        # membership via a per-row gather of keep_block at each posting's
        # local block id (one op regardless of MB; an unrolled compare loop
        # blows up compile time and memory at reference-default MB)
        keep_post = jnp.take_along_axis(
            keep_block,
            jnp.clip(pblock, 0, MB - 1).astype(jnp.int32),
            axis=-1,
        )
        pos_mask = pos_mask & keep_post

    scores = jnp.where(pos_mask, scores, -jnp.inf)
    flat = scores.reshape(B, QC * LL)

    pool = params.dedup_pool if params.dedup_pool > 0 else max(8 * k, 64)
    pool = min(pool, QC * LL)
    top_scores, pos = jax.lax.top_k(flat, pool)  # [B, pool]
    qc_slot = pos // LL
    off = pos % LL
    post_idx = jnp.take_along_axis(lps, qc_slot, axis=1) + off
    safe_post = jnp.minimum(post_idx, index.postings.shape[0] - 1)
    cand_ids = jnp.take(index.postings, safe_post)
    cand_ids = jnp.where(jnp.isfinite(top_scores), cand_ids, n_docs)

    if index.tile_ovf_comps is not None and params.score_cut > 0:
        # Re-rank the pool with each occurrence's out-of-vocab overflow
        # entries (compare-intersect against the query's top terms): adds
        # back the dot mass the local-vocab tile truncates.
        sc = min(params.score_cut, q_vals.shape[1])
        top_v, top_p = jax.lax.top_k(q_vals, sc)
        top_c = jnp.take_along_axis(q_comps, top_p, axis=1)  # [B, sc]
        oc = index.tile_ovf_comps[safe_post].astype(
            jnp.int32
        )  # [B, pool, O]
        ov = index.tile_ovf_vals[safe_post].astype(jnp.float32)
        eq = oc[..., None] == top_c[:, None, None, :]  # [B, pool, O, sc]
        qmatch = jnp.einsum(
            "bpos,bs->bpo",
            eq.astype(jnp.float32),
            top_v,
            preferred_element_type=jnp.float32,
        )
        correction = jnp.sum(qmatch * ov, axis=-1)
        top_scores = jnp.where(
            jnp.isfinite(top_scores), top_scores + correction, top_scores
        )

    dscores, dids = _dedup_by_id(top_scores, cand_ids, n_docs)
    out_scores, opos = jax.lax.top_k(dscores, k)
    out_ids = jnp.take_along_axis(dids, opos, axis=1)

    if params.n_knn > 0 and index.knn is not None:
        qd = densify_query_batch(q_comps, q_vals, index.dim)
        out_scores, out_ids = _knn_refine(
            index, params, qd, out_scores, out_ids
        )

    out_ids = jnp.where(jnp.isfinite(out_scores), out_ids, -1)
    return out_scores, out_ids


def _knn_refine(index: DeviceIndex, params: SearchParams, qd, top_scores,
                top_ids):
    """One neighbor-expansion round (reference: Knn::refine,
    inverted_index.rs:551-593)."""
    B, k = top_ids.shape
    n_docs = index.n_docs
    n_knn = min(params.n_knn, index.knn.shape[1])
    safe_top = jnp.minimum(jnp.maximum(top_ids, 0), n_docs - 1)
    neigh = index.knn[safe_top][..., :n_knn].reshape(B, k * n_knn)
    neigh_valid = (
        jnp.isfinite(top_scores)[:, :, None]
        .repeat(n_knn, axis=2)
        .reshape(B, k * n_knn)
    ) & (neigh >= 0)
    neigh = jnp.where(neigh_valid, neigh, n_docs)
    nscores = _exact_scores(index, qd, jnp.minimum(neigh, n_docs - 1))
    nscores = jnp.where(neigh_valid, nscores, -jnp.inf)
    all_scores = jnp.concatenate([top_scores, nscores], axis=1)
    all_ids = jnp.concatenate([top_ids, neigh], axis=1)
    all_scores, all_ids = _dedup_by_id(all_scores, all_ids, n_docs)
    out_scores, pos = jax.lax.top_k(all_scores, k)
    out_ids = jnp.take_along_axis(all_ids, pos, axis=1)
    return out_scores, out_ids


# ---------------------------------------------------------------------------
# The search program
# ---------------------------------------------------------------------------


def _search_impl(
    index: DeviceIndex,
    q_comps,  # [B, Q] int32, PAD_COMPONENT padded, sorted per row
    q_vals,  # [B, Q] f32, 0 at padding
    heap_factor,  # f32 scalar (traced)
    params: SearchParams,
    sketch_dim: int,
    sketch_seed: int,
):
    B, Q = q_comps.shape
    n_docs = index.n_docs
    dim = index.dim
    MB = max(index.max_blocks_per_list, 1)
    Lmax = max(index.max_block_len, 1)
    n_blocks_total = index.block_start.shape[0]  # includes sentinel
    sentinel_block = n_blocks_total - 1
    k = params.k
    QC = min(params.query_cut, Q)

    valid_q = q_comps != PAD_COMPONENT
    q_vals = jnp.where(valid_q, q_vals, 0.0)

    # ---- 1. select top-query_cut terms (inverted_index.rs:187-190) ----
    top_vals, top_pos = jax.lax.top_k(q_vals, QC)
    list_ids = jnp.take_along_axis(q_comps, top_pos, axis=1)  # [B, QC]
    sel_valid = jnp.take_along_axis(valid_q, top_pos, axis=1) & (
        list_ids < jnp.int32(index.list_block_start.shape[0])
    )
    safe_lists = jnp.where(sel_valid, list_ids, 0).astype(jnp.int32)

    if params.doc_mode == "tiles":
        if getattr(index, "tile_hash", 0):
            raise ValueError(
                "doc_mode='tiles' reads per-list-vocab tiles; this index "
                "was uploaded with HASHED tiles (tile_hash set) — use the "
                "grouped path (search_grouped*), which hashes the query"
            )
        return _tiles_search(
            index, params, q_comps, q_vals, safe_lists, sel_valid,
            heap_factor,
        )

    qd = densify_query_batch(q_comps, q_vals, dim)

    # ---- 2. block windows of the selected lists ----
    lbs = index.list_block_start[safe_lists]  # [B, QC]
    lnb = index.list_n_blocks[safe_lists]  # [B, QC]
    steps = jnp.arange(MB, dtype=jnp.int32)
    block_ids = lbs[..., None] + steps  # [B, QC, MB]
    bmask = (steps < lnb[..., None]) & sel_valid[..., None]
    block_ids = jnp.where(bmask, block_ids, sentinel_block)
    block_ids = block_ids.reshape(B, QC * MB)
    bmask = bmask.reshape(B, QC * MB)

    # ---- 3. block ranking ----
    if params.block_mode == "dense":
        # Per-list local-vocab dense summaries: gather each selected list's
        # vocabulary (a few hundred elements), then score all of its blocks
        # with one contiguous [MB, V] u8 tile matmul on the MXU. Exact with
        # respect to the (vocab-capped) quantized summaries.
        V = index.list_vocab.shape[1]
        vocab = index.list_vocab[safe_lists]  # [B, QC, V]
        qloc = jax.vmap(_lookup)(qd, vocab)  # [B, QC, V]

        def score_list(lbs_scalar, qloc_vec):
            tile = jax.lax.dynamic_slice(
                index.dense_summary, (lbs_scalar, 0), (MB, V)
            )
            scale = jax.lax.dynamic_slice(
                index.dense_scale, (lbs_scalar,), (MB,)
            )
            return (
                jnp.dot(
                    tile.astype(jnp.float32),
                    qloc_vec,
                    preferred_element_type=jnp.float32,
                )
                * scale
            )

        block_scores = jax.vmap(jax.vmap(score_list))(lbs, qloc)
        block_scores = block_scores.reshape(B, QC * MB)
    elif params.block_mode == "sketch":
        q_sk = sketch_padded_queries(q_comps, q_vals, sketch_dim, sketch_seed)
        codes = index.block_sketch[block_ids]  # [B, QC*MB, ds] int8
        scale = index.block_sketch_scale[block_ids]
        block_scores = (
            jnp.einsum(
                "bnd,bd->bn",
                codes.astype(jnp.float32),
                q_sk,
                preferred_element_type=jnp.float32,
            )
            * scale
        )
    elif params.block_mode == "summary":
        s_comps = index.summary_comps[block_ids]  # [B, N, S]
        s_codes = index.summary_codes[block_ids]
        s_mask = s_comps != PAD_COMPONENT
        deq = (
            s_codes.astype(jnp.float32) * index.summary_quant[block_ids][..., None]
            + index.summary_min[block_ids][..., None]
        )
        deq = jnp.where(s_mask, deq, 0.0)
        qvals = jax.vmap(_lookup)(qd, s_comps)
        block_scores = jnp.sum(deq * qvals, axis=-1)
    else:
        raise ValueError(f"unknown block_mode: {params.block_mode}")
    block_scores = jnp.where(bmask, block_scores, -jnp.inf)

    # ---- 4. block budget + heap_factor mask (posting_list.rs:130) ----
    BE = params.block_budget if params.block_budget > 0 else QC * MB
    BE = min(BE, QC * MB)
    top_block_scores, top_block_pos = jax.lax.top_k(block_scores, BE)
    sel_blocks = jnp.take_along_axis(block_ids, top_block_pos, axis=1)
    theta = top_block_scores[:, min(k, BE) - 1]  # proxy for the kth best
    # Guard: with fewer than k finite block scores theta is -inf and
    # heap_factor * theta would be NaN at heap_factor == 0.
    thr = jnp.where(jnp.isfinite(theta), heap_factor * theta, -jnp.inf)
    eval_mask = jnp.isfinite(top_block_scores) & (
        top_block_scores >= thr[:, None]
    )
    sel_blocks = jnp.where(eval_mask, sel_blocks, sentinel_block)

    # ---- 5. candidate doc windows ----
    starts = index.block_start[sel_blocks]  # [B, BE]
    lens = index.block_len[sel_blocks]
    cand_ids = jax.vmap(
        jax.vmap(
            lambda s: jax.lax.dynamic_slice(index.postings, (s,), (Lmax,))
        )
    )(starts)  # [B, BE, Lmax]
    cmask = (jnp.arange(Lmax, dtype=jnp.int32) < lens[..., None]) & eval_mask[
        ..., None
    ]
    NC = BE * Lmax
    cand_ids = jnp.where(cmask, cand_ids, n_docs).reshape(B, NC)
    cmask = cmask.reshape(B, NC)
    safe_cand = jnp.minimum(cand_ids, n_docs - 1)

    if params.doc_mode == "rescore":
        from ..ops.pallas_rescore import rescore_exact

        sc = min(params.score_cut, Q)
        if sc < Q:
            top_v2, top_p2 = jax.lax.top_k(q_vals, sc)
            top_c2 = jnp.take_along_axis(q_comps, top_p2, axis=1)
        else:
            top_v2, top_c2 = q_vals, q_comps
        # chunk over candidate COLUMNS: each kernel step holds a
        # [chunk, W] block pair in VMEM (chunk=512, W=256 -> ~2 MB
        # double-buffered) and each call's gather stays ~1 GB transient
        interp = jax.default_backend() not in ("tpu",)
        chunk = 512
        parts = []
        for c0 in range(0, NC, chunk):
            c1 = min(c0 + chunk, NC)
            parts.append(rescore_exact(
                index, safe_cand[:, c0:c1], top_c2, top_v2, sc,
                interpret=interp,
            ))
        scores = parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=1
        )
        scores = jnp.where(cmask, scores, -jnp.inf)
        # pool then dedup (the visited set) on the small pool only — a
        # full NC-wide sort would dominate the tail. A doc can occur once
        # per selected list, so the pre-dedup pool must be well above k
        # (same default as the tiles path above) or duplicates of the top
        # docs crowd out the k-th unique candidate.
        pool = min(
            params.dedup_pool if params.dedup_pool > 0 else max(8 * k, 64),
            NC,
        )
        pool_scores, ppos = jax.lax.top_k(scores, pool)
        pool_ids = jnp.take_along_axis(cand_ids, ppos, axis=1)
        dscores, dids = _dedup_by_id(pool_scores, pool_ids, n_docs)
        top_scores, pos = jax.lax.top_k(dscores, k)
        top_ids = jnp.take_along_axis(dids, pos, axis=1)
        if params.n_knn > 0 and index.knn is not None:
            qd2 = densify_query_batch(q_comps, q_vals, dim)
            top_scores, top_ids = _knn_refine(
                index, params, qd2, top_scores, top_ids
            )
        top_ids = jnp.where(jnp.isfinite(top_scores), top_ids, -1)
        return top_scores, top_ids

    # ---- 6. coarse candidate ranking (sketch) ----
    NE = params.cand_budget if params.cand_budget > 0 else NC
    NE = min(NE, NC)
    if NE < NC:
        dsk = index.doc_sketch[safe_cand]  # [B, NC, ds]
        dscale = index.doc_sketch_scale[safe_cand]
        if params.block_mode != "sketch":
            q_sk = sketch_padded_queries(
                q_comps, q_vals, sketch_dim, sketch_seed
            )
        coarse = (
            jnp.einsum(
                "bnd,bd->bn",
                dsk.astype(jnp.float32),
                q_sk,
                preferred_element_type=jnp.float32,
            )
            * dscale
        )
        coarse = jnp.where(cmask, coarse, -jnp.inf)
        _, keep_pos = jax.lax.top_k(coarse, NE)
        exact_ids = jnp.take_along_axis(cand_ids, keep_pos, axis=1)
        exact_mask = jnp.take_along_axis(cmask, keep_pos, axis=1)
    else:
        exact_ids = cand_ids
        exact_mask = cmask

    # ---- 7. exact scoring ----
    safe_exact = jnp.minimum(exact_ids, n_docs - 1)
    scores = _exact_scores(index, qd, safe_exact)
    scores = jnp.where(exact_mask, scores, -jnp.inf)

    # ---- 8. dedup (visited set) + top-k ----
    scores, sids = _dedup_by_id(scores, exact_ids, n_docs)
    top_scores, pos = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(sids, pos, axis=1)

    # ---- 9. k-NN refinement (inverted_index.rs:551-593) ----
    if params.n_knn > 0 and index.knn is not None:
        top_scores, top_ids = _knn_refine(
            index, params, qd, top_scores, top_ids
        )

    top_ids = jnp.where(jnp.isfinite(top_scores), top_ids, -1)
    return top_scores, top_ids


@functools.partial(
    jax.jit, static_argnames=("params", "sketch_dim", "sketch_seed")
)
def search_batch_jit(index, q_comps, q_vals, heap_factor, params, sketch_dim, sketch_seed):
    return _search_impl(
        index, q_comps, q_vals, heap_factor, params, sketch_dim, sketch_seed
    )


def search_batch(
    index: DeviceIndex,
    q_comps,
    q_vals,
    params: SearchParams,
    heap_factor: float = 0.7,
    sketch_dim: int = 128,
    sketch_seed: int = 42,
):
    """Convenience wrapper: numpy in, numpy out."""
    scores, ids = search_batch_jit(
        index,
        jnp.asarray(q_comps, dtype=jnp.int32),
        jnp.asarray(q_vals, dtype=jnp.float32),
        jnp.float32(heap_factor),
        params,
        sketch_dim,
        sketch_seed,
    )
    return np.asarray(scores), np.asarray(ids)


def pad_queries(
    q_comps_list, q_vals_list, q_pad: int = 128
) -> tuple[np.ndarray, np.ndarray]:
    """Pack ragged queries into [B, q_pad] padded arrays (components sorted;
    longer queries keep their q_pad largest values)."""
    B = len(q_comps_list)
    comps = np.full((B, q_pad), PAD_COMPONENT, dtype=np.int32)
    vals = np.zeros((B, q_pad), dtype=np.float32)
    for i, (c, v) in enumerate(zip(q_comps_list, q_vals_list)):
        c = np.asarray(c, dtype=np.int64)
        v = np.asarray(v, dtype=np.float32)
        if len(c) > q_pad:
            top = np.argpartition(-v, q_pad)[:q_pad]
            c, v = c[top], v[top]
        order = np.argsort(c, kind="stable")
        c, v = c[order], v[order]
        comps[i, : len(c)] = c
        vals[i, : len(c)] = v
    return comps, vals
