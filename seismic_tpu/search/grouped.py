"""Grouped batch search: the round-2 throughput path.

Pipeline (host planner -> device program):

  host   1. top-`query_cut` terms per query, (query, list) pairs grouped
            by list into M-slot groups, exact per-subtile work list
            (search/planner.py)
  device 2. per-slot query projections onto each group's local vocabulary
            (compare-einsum; gather-free w.r.t. the dense query)
         3. grouped Pallas scorer: each [SUB, V] u8 doc tile streamed once
            per group, scored for all M member queries with one MXU matmul
            (ops/pallas_grouped.py)
         4. per-slot top-t candidates -> regroup to query order via the
            planner's pair_slot table
         5. overflow re-rank (out-of-vocab dot mass) + dedup (visited set)
            + final top-k

Reference parity: same result contract as InvertedIndexBase::search over
the selected lists in the exhaustive-scan limit (heap_factor -> 0,
src/inverted_index.rs:153-234); the heap/skip adaptivity is replaced by
tile-exact scoring of every selected posting (full-lists) or by the
planner's block-pruned work list (see plan_grouped_pruned, round 2+).
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.sparse import PAD_COMPONENT
from ..ops.pallas_grouped import SUB, score_grouped_pallas
from ..types import DeviceIndex
from .planner import GroupedPlan, PlannerContext, plan_grouped


@dataclass(frozen=True)
class GroupedParams:
    """Static (compile-time) parameters of the grouped search program."""

    k: int = 10
    # query terms participating in tile scoring (and overflow re-rank)
    score_cut: int = 64
    # > 0: smaller term budget for the APPROXIMATE qloc projection only
    # (the exact rescore still scans score_cut terms). The qloc kernel's
    # cost is linear in the unrolled compare count, and the projection
    # only ranks candidates for the pool — the tail's exact rescore
    # absorbs small projection errors. 0 = use score_cut.
    qloc_cut: int = 0
    # per-query pool re-ranked with overflow entries and deduped
    pool: int = 128
    # apply the out-of-vocab overflow correction (requires tile_ovf arrays)
    use_ovf: bool = True
    n_knn: int = 0
    # refinement rounds: 2 = also rescore the neighbors of the REFINED
    # top-k (a depth-2 graph walk; the reference's Knn::refine is one
    # round). Each extra round costs one more knn_top*n_knn-row rescore.
    knn_rounds: int = 1
    # > 0: refine the neighbors of only the top `knn_top` results
    # instead of all k (the rescore-row count — the refine round's cost —
    # drops k/knn_top-fold; the reference refines every heap entry,
    # inverted_index.rs:551-593, but neighbor lists of adjacent ranks
    # overlap heavily, so the marginal recall of deep-rank neighbors is
    # small). 0 = all k. Round-5 economics lever (VERDICT r4 #5).
    knn_top: int = 0
    # kernel matmul width: "bf16" = MXU-native (u8 codes exact; qloc
    # rounded to 8 mantissa bits), "f32" = exact-operand reference
    compute_dtype: str = "bf16"
    # overflow re-rank placement: 0 = legacy (correct the whole pool
    # before dedup); > 0 = dedup first, then correct only the top
    # `ovf_pool` unique candidates (cuts the compare-intersection cost
    # pool/ovf_pool-fold; the correction then applies to each id's best
    # pre-correction occurrence only)
    ovf_pool: int = 64
    # > 0: EXACT re-score of the top `rescore` unique candidates from the
    # forward index (ops/pallas_rescore.py) instead of the overflow
    # correction — removes both the vocab-truncation and the u8 tile
    # quantization error from the returned scores. Supersedes ovf when set.
    rescore: int = 0
    # < 1.0: summary-guided streaming budget — keep only the top
    # stream_frac of the batch's work items (super-tiles) ranked by
    # query-projection . super-tile-upper-bound, the TPU analogue of the
    # reference's block skip (posting_list.rs:115-146): heap_factor cuts
    # DMA + MXU work, not just recall. Requires an index uploaded with
    # to_device(super_summaries=True).
    stream_frac: float = 1.0
    # qloc computation: "pallas" = in-VMEM projection kernel,
    # "einsum" = the round-2 XLA compare-einsum (reference path).
    # (An all-int16 kernel was probed and rejected: Mosaic on this device
    # does not support 16-bit vector compares — probe_r3b.)
    qloc_mode: str = "pallas"
    # bucket capacity per residue group for the residue-bucketed qloc
    # kernel (active when the index was uploaded with vocab_residue=R):
    # R * residue_scb term slots total; overflow drops the bucket's
    # smallest values only
    residue_scb: int = 16
    # candidate-pool selection: "approx" = lax.approx_max_k (TPU PartialReduce,
    # several x faster than the full sort of lax.top_k; per-element recall
    # `pool_recall` on the PADDED row, which overwhelmingly drops tail-of-pool
    # entries, not top-k ones), "exact" = lax.top_k, "hier" = per-(query,
    # list) approx top-`pool_per_pair` then a small exact merge (cheapest;
    # caps each list's contribution to the pool), "slot" = like hier but
    # stage 1 runs on the KERNEL's slot grid BEFORE regrouping — the
    # full-width [B*QC, LLMAX] regroup gather shrinks to a [B*QC, t]
    # gather of already-pooled candidates (round-3 tail cut)
    # "window" = the round-3 packed-index pool: the scorer kernel packs
    # each score's bit pattern with its row offset into one int32; pooling
    # is a single reduce_window max per `pool_window` rows on the SLOT
    # grid (no full-width regroup gather, no approx_max_k PartialReduce),
    # then a tiny [B, QC * LLMAX/pool_window] exact merge. Measured: fast
    # but conflates CONSECUTIVE rows — same k-means block, i.e. similar
    # docs — so recall drops when two top-k docs share a block.
    # "stride" = the fix, split across kernel and XLA: the kernel
    # collapses rk = min(pool_stride, csub*128/128) rows >= 128 apart
    # per packed col (free 128-aligned lane max — shrinks the
    # mostly-padding slot-grid output rk-fold), the pair regroup gather
    # runs NEXT (reads only real pairs' rows), and the remaining
    # pool_stride/rk max runs pair-major in XLA (conflated rows >= 32
    # apart within one work item = always different k-means blocks, so
    # the conflated docs are dissimilar by construction); unwritten
    # output regions stay self-contained and are masked by item start
    # row vs pair list length.
    # "seg" = exact two-level segment pool: reduce the wall to per-segment
    # maxima (one cheap max pass over [B, QC*LLMAX/seg_width]), take the
    # top-`pool` SEGMENTS, gather only those segments' rows and finish
    # with a small exact top_k. Containment is exact: if a true top-pool
    # row's segment were excluded, `pool` other segments would each hold a
    # strictly better row — contradiction — so seg == exact top-pool rows
    # (unlike "stride"/"window", no conflation loss: all rows of selected
    # segments survive to the final top_k). Replaces the PartialReduce
    # over the full wall (the 52ms headline pool stage at B=16384) with
    # one reduce + a [B, pool*seg_width]-lane top_k.
    pool_mode: str = "approx"
    pool_recall: float = 0.98
    pool_per_pair: int = 12
    pool_seg_width: int = 32
    pool_window: int = 8
    pool_stride: int = 8
    # final pool selection for the packed modes ("window"/"stride"):
    # "exact" = lax.top_k over [B, QC*NW], "approx" = lax.approx_max_k
    # (PartialReduce, cheaper on wide rows; per-element pool_recall)
    pool_select: str = "exact"
    # dtype of the regrouped score wall the pool selects over
    # (hier/approx/exact/slot modes): "bf16" halves the [B, QC*LLMAX]
    # traffic and the PartialReduce cost at the price of 8-bit-mantissa
    # pool ORDER (the rescore stays exact; only near-ties at the pool
    # boundary can swap). The 100K pool stage is the biggest headline
    # line (54ms of 173ms at B=16384, probe_r5b) — this trades pool
    # precision the i8 kernel doesn't have anyway for its bandwidth.
    pool_dtype: str = "f32"
    # rescore-path dedup placement: "pre" = sort-dedup the whole pool
    # before picking the rescore set (max unique candidates); "post" =
    # rescore the raw top-`rescore` (dups waste some rescore lanes) and
    # dedup the small exact-scored set — skips the pool-wide 3-operand
    # variadic sort, which is the costliest tail op on this device
    dedup_mode: str = "pre"
    # work items per Pallas grid step (i8 path; power of two dividing
    # W_cap). > 1 amortizes the ~0.5 us/step Mosaic overhead that
    # dominated the round-2 kernel (W ~ 24K steps at bench shapes) and
    # switches the kernel output to work-item-major [W_cap, M, STEP]
    # (regrouped to pair order via the per-group item prefix sum).
    # Supported with pool_mode "stride"/"hier"/"approx"/"exact".
    kernel_unroll: int = 1
    # > 0: the index is a BLOCK-summary view (ops/pallas_tiles.py::
    # block_pool_arrays — one scored row per k-means block instead of per
    # posting). The pool then selects BLOCKS; each pooled block is
    # expanded into up to `block_expand` member postings through
    # block_start/block_len and ALL of them are exact-rescored from the
    # forward index — the TPU analogue of the reference's summary gate +
    # evaluate_posting_block economics (posting_list.rs:115-215), with
    # the sequential heap threshold replaced by a fixed per-query block
    # pool. `pool` = blocks kept per query; `rescore`/ovf knobs are
    # ignored (the expansion IS the exact rescore). This is the
    # memory-lean fast path: no per-posting tile replication on device.
    block_expand: int = 0
    # > 0: exact-rescore the block_expand candidate set in sequential
    # column chunks of this size (lax.map): bounds the forward-row gather
    # temps to [B*chunk, W] instead of [B*pool*E, W]. The 8.8M deep-pool
    # rungs need this — pool >= 64 at B=2048 OOMed XLA's temp plan at
    # 20-25 GB vs 15.75 GB HBM (round-4 r3j log). 0 = single call.
    rescore_chunk: int = 0
    # profiling: truncate the program after a stage ("qloc", "expand",
    # "kernel", "regroup", "pool", "prerank") and return that stage's
    # output — used by the harness to attribute fused-program time
    stop_after: str = ""
    # return a third output: the per-query pool-truncation MARGIN
    # (kth exact score - bias-corrected pass pool bottom) consumed by the
    # two-pass adaptive driver (search/twopass.py). Requires rescore > 0.
    # margin < eps means docs ranked below the pool bottom could have
    # beaten the kth result — the query is a deep-pass candidate; margin
    # = +inf when the pool was not even filled (nothing was truncated).
    return_margin: bool = False


# plan fields packed into ONE int32 host array -> ONE host->device
# transfer per batch (13 separate small uploads cost ~1 ms dispatch each
# over the PCIe/tunnel path; packing makes per-batch planning overhead
# one transfer + in-jit slices, which XLA folds into consumers)
_PLAN_FIELDS = (
    # (name, shape_fn(M, G_cap, W_cap, B, QC))
    ("group_list", lambda M, G, W, B, QC: (G,)),
    ("group_region", lambda M, G, W, B, QC: (G,)),
    ("group_nrows", lambda M, G, W, B, QC: (G,)),
    ("slot_b", lambda M, G, W, B, QC: (G, M)),
    ("work_region", lambda M, G, W, B, QC: (W,)),
    ("work_g", lambda M, G, W, B, QC: (W,)),
    ("work_s", lambda M, G, W, B, QC: (W,)),
    ("pair_slot", lambda M, G, W, B, QC: (B, QC)),
    ("pair_pstart", lambda M, G, W, B, QC: (B, QC)),
    ("pair_valid", lambda M, G, W, B, QC: (B, QC)),
    ("pair_list", lambda M, G, W, B, QC: (B, QC)),
    ("pair_len", lambda M, G, W, B, QC: (B, QC)),
    ("slot_pair", lambda M, G, W, B, QC: (G * M,)),
)


class _PlanView:
    """Trace-time view of the packed plan: named int32 arrays."""

    __slots__ = tuple(n for n, _ in _PLAN_FIELDS) + ("M",)


@dataclass
class DevicePlan:
    """Device-resident mirror of GroupedPlan: one packed int32 buffer plus
    the static shape signature (pytree; shapes are aux data)."""

    packed: object  # int32 [total]
    M: int = 8
    G_cap: int = 0
    W_cap: int = 0
    B: int = 0
    QC: int = 0

    @staticmethod
    def pack_host(plan: GroupedPlan) -> np.ndarray:
        parts = []
        for name, _ in _PLAN_FIELDS:
            a = getattr(plan, name)
            parts.append(np.ascontiguousarray(a, dtype=np.int32).reshape(-1))
        return np.concatenate(parts)

    @staticmethod
    def put(plan: GroupedPlan, device=None):
        packed = jax.device_put(
            jnp.asarray(DevicePlan.pack_host(plan)), device
        )
        B, QC = plan.pair_slot.shape
        return DevicePlan(
            packed=packed, M=plan.M, G_cap=plan.G_cap, W_cap=plan.W_cap,
            B=B, QC=QC,
        )

    def view(self) -> "_PlanView":
        """Slice the packed buffer into named arrays (trace time; XLA
        folds the slices into their consumers)."""
        v = _PlanView()
        v.M = self.M
        off = 0
        dims = (self.M, self.G_cap, self.W_cap, self.B, self.QC)
        for name, shape_fn in _PLAN_FIELDS:
            shape = shape_fn(*dims)
            n = int(np.prod(shape))
            arr = self.packed[off : off + n]
            if name == "pair_valid":
                arr = arr.astype(bool)
            setattr(v, name, arr.reshape(shape))
            off += n
        return v


def _register_device_plan():
    def flatten(p):
        return (p.packed,), (p.M, p.G_cap, p.W_cap, p.B, p.QC)

    def unflatten(aux, children):
        return DevicePlan(packed=children[0], M=aux[0], G_cap=aux[1],
                          W_cap=aux[2], B=aux[3], QC=aux[4])

    jax.tree_util.register_pytree_node(DevicePlan, flatten, unflatten)


_register_device_plan()


def _residue_buckets(top_c, top_v, R: int, scb: int):
    """Per-query residue-bucketed term tables for the bucketed qloc
    kernel: terms are grouped by `term % R` into R buckets of `scb`
    slots, keeping value order (top_c/top_v arrive value-sorted, and the
    secondary sort key preserves that), so bucket overflow drops only the
    smallest values. Returns (qcb int32 [B, R*scb] with -2 padding, qvb
    f32 [B, R*scb])."""
    B, sc = top_c.shape
    valid = (top_c != PAD_COMPONENT) & (top_c >= 0)
    r_key = jnp.where(valid, top_c % R, R).astype(jnp.int32)
    pos = jnp.broadcast_to(
        jnp.arange(sc, dtype=jnp.int32), (B, sc)
    )
    rk_s, _, c_s, v_s = jax.lax.sort(
        (r_key, pos, top_c.astype(jnp.int32), top_v),
        dimension=1, num_keys=2,
    )
    new_grp = jnp.concatenate(
        [jnp.ones((B, 1), bool), rk_s[:, 1:] != rk_s[:, :-1]], axis=1
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_grp, pos, 0), axis=1
    )
    rank = pos - seg_start
    dump = R * scb
    dst = jnp.where((rank < scb) & (rk_s < R), rk_s * scb + rank, dump)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    qcb = jnp.full((B, dump + 1), -2, jnp.int32).at[bidx, dst].set(
        c_s
    )[:, :dump]
    qvb = jnp.zeros((B, dump + 1), jnp.float32).at[bidx, dst].set(
        v_s
    )[:, :dump]
    return qcb, qvb


def _item_regroup(scores_item, plan, csub: int, NSUP: int):
    """Regroup a work-item-major kernel output [W_cap, M, STEP] to pair
    order [B*QC, NSUP*STEP]: a group's items are consecutive in the work
    list, so pair (g, m) reads rows (w0[g] + s) * M + m, where w0 is the
    per-group item prefix sum (recomputed from group_nrows — identical to
    the planner's layout for both host and device-derived plans). Columns
    past a pair's real item count land in a NEIGHBOR group's rows; they
    are always masked downstream because their implied posting offset
    s * ROWS >= nsup * ROWS >= pair_len."""
    W_cap, M, STEP = scores_item.shape
    nrows = plan.group_nrows
    nsub = jnp.maximum(1, -(-nrows // SUB))
    nsup = jnp.where(nrows > 0, -(-nsub // csub), 0).astype(jnp.int32)
    w0 = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nsup, dtype=jnp.int32)]
    )[:-1]
    slot = plan.pair_slot.reshape(-1)  # [P]
    g_p = slot // M
    m_p = slot % M
    rows = (
        (w0[g_p][:, None] + jnp.arange(NSUP, dtype=jnp.int32)[None, :]) * M
        + m_p[:, None]
    )  # [P, NSUP]
    rows = jnp.clip(rows, 0, W_cap * M - 1)
    P = slot.shape[0]
    out = scores_item.reshape(W_cap * M, STEP)[rows]  # [P, NSUP, STEP]
    return out.reshape(P, NSUP * STEP)


def _ovf_correction(index: DeviceIndex, top_c, top_v, top_scores, safe_post):
    """Re-rank a candidate pool with each occurrence's out-of-vocab
    overflow entries: adds back the dot mass the local-vocab tile
    truncates. top_c/top_v: [B, sc] the query's top terms."""
    oc = index.tile_ovf_comps[safe_post].astype(jnp.int32)  # [B, pool, O]
    ov = index.tile_ovf_vals[safe_post].astype(jnp.float32)
    eq = oc[..., None] == top_c[:, None, None, :]  # [B, pool, O, sc]
    qmatch = jnp.einsum(
        "bpos,bs->bpo",
        eq.astype(jnp.float32),
        top_v,
        preferred_element_type=jnp.float32,
    )
    correction = jnp.sum(qmatch * ov, axis=-1)
    return jnp.where(
        jnp.isfinite(top_scores), top_scores + correction, top_scores
    )


def _knn_refine_grouped(index, params, top_c, top_v, sc, top_scores,
                        top_ids, interpret):
    """k-NN refinement on the exact-rescore kernel (reference Knn::refine,
    inverted_index.rs:551-593): one wide-row gather of neighbor ids + one
    compare-kernel scoring round, no element gathers."""
    from ..ops.pallas_rescore import rescore_exact
    from .engine import _dedup_by_id

    B, k = top_ids.shape
    n_docs = index.n_docs
    n_knn = min(params.n_knn, index.knn.shape[1])
    # economics lever (VERDICT r4 #5): neighbor lists of adjacent ranks
    # overlap heavily, so refining only the top-m heap entries keeps most
    # of the recall gain at m/k of the rescore cost. top_scores is sorted
    # descending, so the top-m slice is a static prefix.
    m = k if params.knn_top <= 0 else min(params.knn_top, k)
    for _ in range(max(1, params.knn_rounds)):
        src_ids = top_ids[:, :m]
        safe_top = jnp.clip(src_ids, 0, n_docs - 1)
        neigh = index.knn[safe_top][..., :n_knn].reshape(B, m * n_knn)
        neigh_valid = (
            jnp.isfinite(top_scores[:, :m])[:, :, None]
            .repeat(n_knn, axis=2)
            .reshape(B, m * n_knn)
        ) & (neigh >= 0)
        nscores = rescore_exact(
            index, jnp.where(neigh_valid, neigh, 0), top_c, top_v, sc,
            interpret=interpret,
        )
        nscores = jnp.where(neigh_valid, nscores, -jnp.inf)
        neigh = jnp.where(neigh_valid, neigh, n_docs)
        all_scores = jnp.concatenate([top_scores, nscores], axis=1)
        all_ids = jnp.concatenate([top_ids, neigh], axis=1)
        all_scores, all_ids = _dedup_by_id(all_scores, all_ids, n_docs)
        top_scores, pos = jax.lax.top_k(all_scores, k)
        top_ids = jnp.take_along_axis(all_ids, pos, axis=1)
    return top_scores, top_ids


def _dedup_with_payload(scores, ids, payload, n_docs: int):
    """`_dedup_by_id` carrying an int32 payload column through the sort
    (used to keep each candidate's posting position for the post-dedup
    overflow re-rank)."""
    ids = jnp.where(jnp.isfinite(scores), ids, n_docs)
    neg = jnp.where(jnp.isfinite(scores), -scores, jnp.inf)
    ids_s, neg_s, pay_s = jax.lax.sort(
        (ids.astype(jnp.int32), neg, payload.astype(jnp.int32)),
        dimension=-1,
        num_keys=2,
    )
    scores_s = -neg_s
    dup = jnp.concatenate(
        [
            jnp.zeros_like(ids_s[..., :1], dtype=bool),
            ids_s[..., 1:] == ids_s[..., :-1],
        ],
        axis=-1,
    )
    invalid = ids_s >= n_docs
    scores_s = jnp.where(dup | invalid, -jnp.inf, scores_s)
    return scores_s, ids_s, pay_s


def derive_plan_device(
    index: DeviceIndex,
    q_comps,  # [B, Q] int32
    q_vals,  # [B, Q] f32
    query_cut: int,
    M: int,
    G_cap: int,
    W_cap: int,
    zero_region: int,  # SUPER-tile units (PlannerContext.zero_region)
    weighted: bool = False,
) -> "_PlanView":
    """Build the grouped plan ON DEVICE (sorts + scans + scatters, ~1 ms),
    replacing the host plan upload: the host's only job is supplying the
    static capacities (G_cap, W_cap) — its native planner runs during the
    previous batch's device time, so nothing serializes. Semantics match
    plan_grouped (group composition is identical for any top-QC tie
    order; see native planner notes)."""
    B, Q = q_comps.shape
    QC = min(query_cut, Q)
    P = B * QC
    csub = index.tile_csub
    n_lists = index.list_len.shape[0]

    valid_q = q_comps != PAD_COMPONENT
    qv = jnp.where(valid_q, q_vals, 0.0)
    if weighted:
        # weighted cut: rank candidate lists by value * per-list max
        # posting value — measured to buy ~one query_cut step of
        # reachability over the reference's plain value top-k
        okc = valid_q & (q_comps >= 0) & (q_comps < n_lists)
        wsel = jnp.where(
            okc,
            index.list_weight[jnp.clip(q_comps, 0, n_lists - 1)], 0.0
        )
        sel_score = qv * wsel
    else:
        sel_score = qv
    if QC < Q:
        _, top_p = jax.lax.top_k(sel_score, QC)
        top_v = jnp.take_along_axis(qv, top_p, axis=1)
        lids = jnp.take_along_axis(q_comps, top_p, axis=1)
    else:
        top_v, lids = qv, q_comps
    safe_l = jnp.clip(lids, 0, n_lists - 1)
    llen = index.list_len[safe_l]
    valid = (
        (top_v > 0) & (lids >= 0) & (lids < n_lists) & (llen > 0)
    ).reshape(P)
    keys = jnp.where(valid, safe_l.reshape(P), n_lists).astype(jnp.int32)
    flat_idx = jnp.arange(P, dtype=jnp.int32)
    sl, sp = jax.lax.sort((keys, flat_idx), dimension=0, num_keys=1)
    valid_s = sl < n_lists

    idx = jnp.arange(P, dtype=jnp.int32)
    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), sl[1:] != sl[:-1]]
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_seg, idx, 0)
    )
    rank = idx - seg_start
    m_of = rank % M
    gflag = valid_s & (m_of == 0)
    g_of = jnp.cumsum(gflag.astype(jnp.int32)) - 1
    G = jnp.sum(gflag.astype(jnp.int32))

    dump_slot = G_cap * M - 1  # a padding group's slot; masked downstream
    slot = g_of * M + m_of
    scat_g = jnp.where(gflag, g_of, G_cap)  # drop-mode for non-leads
    scat_s = jnp.where(valid_s, slot, G_cap * M)  # drop invalid pairs

    v = _PlanView()
    v.M = M
    v.group_list = jnp.zeros(G_cap, jnp.int32).at[scat_g].set(
        sl, mode="drop"
    )
    v.group_nrows = jnp.zeros(G_cap, jnp.int32).at[scat_g].set(
        index.list_len[jnp.minimum(sl, n_lists - 1)], mode="drop"
    )
    v.group_region = jnp.full(G_cap, 0, jnp.int32).at[scat_g].set(
        index.list_region_start[jnp.minimum(sl, n_lists - 1)], mode="drop"
    )
    v.slot_b = (
        jnp.full(G_cap * M, B, jnp.int32)
        .at[scat_s].set(sp // QC, mode="drop")
        .reshape(G_cap, M)
    )
    v.slot_pair = jnp.zeros(G_cap * M, jnp.int32).at[scat_s].set(
        sp, mode="drop"
    )
    # pair tables, indexed by the original (b, qc-slot) flat position
    scat_p = jnp.where(valid_s, sp, P)
    v.pair_slot = (
        jnp.full(P, dump_slot, jnp.int32)
        .at[scat_p].set(slot, mode="drop").reshape(B, QC)
    )
    safe_sl = jnp.minimum(sl, n_lists - 1)
    v.pair_pstart = (
        jnp.zeros(P, jnp.int32)
        .at[scat_p].set(index.list_post_start[safe_sl], mode="drop")
        .reshape(B, QC)
    )
    v.pair_valid = (
        jnp.zeros(P, bool).at[scat_p].set(True, mode="drop").reshape(B, QC)
    )
    v.pair_list = (
        jnp.zeros(P, jnp.int32).at[scat_p].set(sl, mode="drop")
        .reshape(B, QC)
    )
    v.pair_len = (
        jnp.zeros(P, jnp.int32)
        .at[scat_p].set(index.list_len[safe_sl], mode="drop")
        .reshape(B, QC)
    )

    # work list: one item per (group, super-tile); item -> group via
    # binary search over the cumulative super-tile counts
    gidx = jnp.arange(G_cap, dtype=jnp.int32)
    nsub = jnp.maximum(1, -(-v.group_nrows // 128))
    nsup = jnp.where(gidx < G, -(-nsub // csub), 0)
    S0 = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nsup, dtype=jnp.int32)]
    )
    W = S0[-1]
    w = jnp.arange(W_cap, dtype=jnp.int32)
    g_w = jnp.searchsorted(S0[1:], w, side="right").astype(jnp.int32)
    g_w = jnp.minimum(g_w, G_cap - 1)
    s_w = w - S0[g_w]
    valid_w = w < W
    region_w = v.group_region[g_w] // csub + s_w
    v.work_region = jnp.where(valid_w, region_w, zero_region)
    v.work_g = jnp.where(valid_w, g_w, jnp.minimum(G, G_cap - 1))
    v.work_s = jnp.where(valid_w, s_w, 0)
    return v


def _grouped_impl(
    index: DeviceIndex,
    plan,  # DevicePlan (packed) or _PlanView (device-derived)
    q_comps,  # [B, Q] int32 PAD_COMPONENT padded
    q_vals,  # [B, Q] f32
    params: GroupedParams,
):
    from .engine import _dedup_by_id, _knn_refine, densify_query_batch

    if isinstance(plan, DevicePlan):
        plan = plan.view()  # packed buffer -> named trace-time slices
    B, Q = q_comps.shape
    G_cap, M = plan.slot_b.shape
    V = index.tile_hash or index.list_vocab.shape[1]
    n_docs = index.n_docs
    k = params.k
    csub = index.tile_csub
    from ..ops_pallas_prep import ll_pad_for

    LLMAX = ll_pad_for(index.max_list_len, csub)

    valid_q = q_comps != PAD_COMPONENT
    qv = jnp.where(valid_q, q_vals, 0.0)
    sc = min(params.score_cut, Q)
    if sc < Q:
        top_v, top_p = jax.lax.top_k(qv, sc)
        top_c = jnp.take_along_axis(q_comps, top_p, axis=1)  # [B, sc]
    else:
        top_v, top_c = qv, q_comps

    interpret = jax.default_backend() != "tpu"
    QC = plan.pair_list.shape[1]

    # ---- per-pair query projections, expanded to slot order ----
    # qloc is computed on the compact [B * QC] pair grid (cost scales with
    # real pairs, not padded slots) and then spread to the [G_cap, M] slot
    # grid with a wide-row gather, which runs at HBM speed on this device
    # (harness/profile_tiles.py measurement).
    scq = min(params.qloc_cut, sc) if params.qloc_cut > 0 else sc
    slot_src = plan.slot_pair
    if index.tile_hash:
        # ---- hashed tiles: ONE projection row per QUERY ----
        # tile columns are hash buckets (comp mod V), so the query's
        # bucket vector is list-independent: q_hash[b] = sum of query
        # values whose term hashes to b. This removes the [P, V] per-pair
        # vocabulary gather AND shrinks the projection kernel B*QC-fold
        # (the qloc chain was ~24% of the batch at the 100K bench shape).
        from ..ops.pallas_qloc import LANES, project_qloc_pallas

        B_cap = -(-B // LANES) * LANES
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (V, B_cap), 0)
        qch = jnp.where(top_c[:, :scq] == PAD_COMPONENT, PAD_COMPONENT,
                        top_c[:, :scq] % V)
        SCP = -(-scq // 8) * 8
        qcT = qch.T  # [scq, B]
        qvT = top_v[:, :scq].T
        if SCP > scq:
            qcT = jnp.pad(qcT, ((0, SCP - scq), (0, 0)),
                          constant_values=PAD_COMPONENT)
            qvT = jnp.pad(qvT, ((0, SCP - scq), (0, 0)))
        if B_cap > B:
            qcT = jnp.pad(qcT, ((0, 0), (0, B_cap - B)),
                          constant_values=PAD_COMPONENT)
            qvT = jnp.pad(qvT, ((0, 0), (0, B_cap - B)))
        qlocT = project_qloc_pallas(iota_v, qcT, qvT, scq,
                                    interpret=interpret)  # [V, B_cap]
        slot_src = plan.slot_pair // QC  # slot -> query row
        if params.compute_dtype == "i8":
            amaxT = jnp.max(jnp.abs(qlocT), axis=0, keepdims=True)
            qscaleT = jnp.maximum(amaxT, 1e-20) / 127.0  # [1, B_cap]
            q_i8 = jnp.round(qlocT / qscaleT).astype(jnp.int8).T[:B]
            qloc_pairs = None
            # per-query scale, broadcast to the pair grid all downstream
            # consumers index (pair-major [B*QC] / slot gathers)
            pair_scale = jnp.broadcast_to(
                qscaleT[0, :B, None], (B, QC)
            ).reshape(B * QC)
        else:
            qloc_pairs = qlocT.T[:B]  # [B, V]
        if params.stop_after == "qloc":
            return qlocT, qlocT
    elif params.qloc_mode == "rowmajor":
        # row-major i8 projection (ops/pallas_qloc.py): consumes the
        # [P, V] vocab gather output directly and emits the [P, V] int8
        # the slot expansion wants — none of the lane-major path's three
        # materialized transposes (vocabT, qcT/qvT, int8 .T), which were
        # the qloc chain's dominant HBM traffic at large B.
        from ..ops.pallas_qloc import ROWP, project_qloc_rowmajor

        assert params.compute_dtype == "i8", "rowmajor qloc is i8-only"
        assert index.vocab_residue == 0, (
            "rowmajor qloc and vocab_residue are exclusive")
        P = B * QC
        P_cap = -(-P // ROWP) * ROWP
        pair_list_flat = plan.pair_list.reshape(P)
        if index.vocab16 is not None:
            vocab_rows = index.vocab16[pair_list_flat]  # [P, V] i16
        else:
            vocab_rows = index.list_vocab[pair_list_flat].astype(jnp.int32)
        SCP = -(-scq // 8) * 8
        qcP = jnp.broadcast_to(
            top_c[:, None, :scq], (B, QC, scq)).reshape(P, scq)
        qvP = jnp.broadcast_to(
            top_v[:, None, :scq], (B, QC, scq)).reshape(P, scq)
        if SCP > scq:
            qcP = jnp.pad(qcP, ((0, 0), (0, SCP - scq)),
                          constant_values=PAD_COMPONENT)
            qvP = jnp.pad(qvP, ((0, 0), (0, SCP - scq)))
        if P_cap > P:
            vocab_rows = jnp.pad(vocab_rows, ((0, P_cap - P), (0, 0)),
                                 constant_values=-1)
            qcP = jnp.pad(qcP, ((0, P_cap - P), (0, 0)),
                          constant_values=PAD_COMPONENT)
            qvP = jnp.pad(qvP, ((0, P_cap - P), (0, 0)))
        q_i8_full, scaleP = project_qloc_rowmajor(
            vocab_rows, qcP, qvP, scq, interpret=interpret)
        q_i8 = q_i8_full[:P]
        qloc_pairs = None
        pair_scale = scaleP[:P, 0]
        if params.stop_after == "qloc":
            return q_i8, q_i8
    elif params.qloc_mode == "pallas":
        from ..ops.pallas_qloc import (
            LANES,
            project_qloc_pallas,
            project_qloc_residue,
        )

        P = B * QC
        P_cap = -(-P // LANES) * LANES
        pair_list_flat = plan.pair_list.reshape(P)
        if index.vocab16 is not None:
            # int16 vocab twin: halves the [P, V] gather + transpose bytes
            # (the qloc chain's dominant cost); widened in-kernel
            vocabT = index.vocab16[pair_list_flat].T
        else:
            vocabT = index.list_vocab[pair_list_flat].astype(jnp.int32).T
        R = index.vocab_residue
        if R > 0:
            # residue-bucketed projection: ~3x fewer in-kernel compares
            qcb, qvb = _residue_buckets(
                top_c[:, :scq], top_v[:, :scq], R, params.residue_scb
            )
            SCT = R * params.residue_scb
            SCP = -(-scq // 8) * 8

            def bc(a, W, fill):
                t = jnp.broadcast_to(a[:, None, :], (B, QC, a.shape[1]))
                t = t.reshape(P, a.shape[1]).T
                if a.shape[1] < W:
                    t = jnp.pad(t, ((0, W - a.shape[1]), (0, 0)),
                                constant_values=fill)
                if P_cap > P:
                    t = jnp.pad(t, ((0, 0), (0, P_cap - P)),
                                constant_values=fill)
                return t

            qcbT = bc(qcb, SCT, -2)
            qvbT = bc(qvb, SCT, 0.0)
            qcT = bc(top_c[:, :scq].astype(jnp.int32), SCP, -2)
            qvT = bc(top_v[:, :scq], SCP, 0.0)
            if P_cap > P:
                vocabT = jnp.pad(vocabT, ((0, 0), (0, P_cap - P)))
            qlocT = project_qloc_residue(
                vocabT, qcbT, qvbT, qcT, qvT, R, params.residue_scb,
                scq, interpret=interpret,
            )  # [V, P_cap] lane-major
        else:
            # sublane-pad the term axis to a multiple of 8 (vocab PAD
            # slots can only match qc PAD slots, whose value is 0)
            SCP = -(-scq // 8) * 8
            qcT = jnp.broadcast_to(
                top_c[:, None, :scq], (B, QC, scq)
            ).reshape(P, scq).T  # [scq, P]
            qvT = jnp.broadcast_to(
                top_v[:, None, :scq], (B, QC, scq)
            ).reshape(P, scq).T
            if SCP > scq:
                qcT = jnp.pad(qcT, ((0, SCP - scq), (0, 0)),
                              constant_values=PAD_COMPONENT)
                qvT = jnp.pad(qvT, ((0, SCP - scq), (0, 0)))
            if P_cap > P:
                vocabT = jnp.pad(vocabT, ((0, 0), (0, P_cap - P)))
                qcT = jnp.pad(qcT, ((0, 0), (0, P_cap - P)),
                              constant_values=PAD_COMPONENT)
                qvT = jnp.pad(qvT, ((0, 0), (0, P_cap - P)))
            qlocT = project_qloc_pallas(
                vocabT, qcT, qvT, scq, interpret=interpret
            )  # [V, P_cap] lane-major
        if params.compute_dtype == "i8":
            # quantize LANE-MAJOR (per-pair = per-lane amax over
            # sublanes), then transpose the int8 array: a 4x cheaper
            # relayout than transposing the f32 projection first
            amaxT = jnp.max(jnp.abs(qlocT), axis=0, keepdims=True)
            qscaleT = jnp.maximum(amaxT, 1e-20) / 127.0  # [1, P_cap]
            q_i8 = jnp.round(qlocT / qscaleT).astype(jnp.int8).T[:P]
            qloc_pairs = None
            pair_scale = qscaleT[0, : B * QC]
        else:
            qloc_pairs = qlocT.T[:P]  # [P, V]
        if params.stop_after == "qloc":
            return qlocT, qlocT
    else:
        from .engine import _qloc_compare

        vocab = index.list_vocab[plan.pair_list].astype(jnp.int32)
        qloc_pairs = _qloc_compare(vocab, q_comps, qv, scq).reshape(
            B * QC, V
        )
        if params.compute_dtype == "i8":
            amax = jnp.max(jnp.abs(qloc_pairs), axis=-1, keepdims=True)
            qscale_pairs = jnp.maximum(amax, 1e-20) / 127.0  # [P, 1]
            q_i8 = jnp.round(qloc_pairs / qscale_pairs).astype(jnp.int8)
            pair_scale = qscale_pairs[: B * QC, 0]

    if params.compute_dtype == "i8":
        # the kernel runs an i8 x i8 -> i32 MXU matmul (2x bf16 rate);
        # the per-pair scale is re-applied in the regroup below.
        # Expansion traffic drops 4x vs f32 qloc. (hashed tiles: slot_src
        # maps slots to per-QUERY projection rows instead of pair rows)
        qloc = q_i8[slot_src].reshape(G_cap, M, V)
        qsum = None
    else:
        qloc = qloc_pairs[slot_src].reshape(G_cap, M, V)
        # lane-replicated 128 * sum_v qloc for the centered-tile correction
        # (full csub*128 lane width; see pallas_grouped qsum note)
        qsum_pairs = 128.0 * jnp.sum(qloc_pairs, axis=-1)  # [P] (or [B])
        qsum = jnp.broadcast_to(
            qsum_pairs[slot_src].reshape(G_cap, M, 1),
            (G_cap, M, csub * 128),
        )
        pair_scale = None

    if params.stop_after == "expand":
        return qloc, qloc

    work_region, work_g, work_s = (
        plan.work_region, plan.work_g, plan.work_s
    )
    streamed = None
    W_cap = work_region.shape[0]
    NSUP = LLMAX // (csub * 128)
    if params.stream_frac < 1.0:
        assert index.super_summary is not None, (
            "stream_frac < 1 needs to_device(super_summaries=True)"
        )
        # priority[w] = max over the group's slots of
        #   qloc[g_w, m] . upper_bound(super-tile w)
        ub = (
            index.super_summary[work_region].astype(jnp.bfloat16)
        )  # [W_cap, V]
        qg = qloc[work_g].astype(jnp.bfloat16)  # [W_cap, M, V]
        # padding items point at the all-zero tail region: ub = 0 ->
        # priority 0, naturally below every useful item
        pr_wm = jnp.einsum(
            "wmv,wv->wm", qg, ub, preferred_element_type=jnp.float32
        )  # [W_cap, M]
        if pair_scale is not None:
            # i8 qloc is in per-pair quantized units; re-apply each slot's
            # scale so priorities are comparable across pairs in a group
            slot_scale = pair_scale[plan.slot_pair].reshape(G_cap, M)
            pr_wm = pr_wm * slot_scale[work_g]
        pr = pr_wm.max(axis=1) * index.super_scale[work_region]
        Wb = max(128, int(round(params.stream_frac * W_cap)))
        Wb = min(Wb, W_cap)
        _, keep = jax.lax.top_k(pr, Wb)
        keep = jnp.sort(keep)  # restore group-major order (qloc reuse)
        work_region = work_region[keep]
        work_g = work_g[keep]
        work_s = work_s[keep]
        streamed = jnp.zeros((G_cap, NSUP), bool).at[
            work_g, work_s
        ].set(True, mode="drop")

    # ---- grouped tile scoring on the MXU ----
    pack_idx = params.pool_mode in ("window", "stride")
    rk = 1
    if params.pool_mode == "stride":
        # in-kernel share of the stride max (128-aligned lane slices, free
        # in Mosaic): shrinks the mostly-padding slot-grid output rk-fold
        rk = max(1, min(params.pool_stride, (csub * SUB) // 128))
    item_major = params.kernel_unroll > 1
    if item_major:
        assert params.compute_dtype == "i8", "kernel_unroll is i8-only"
        assert params.pool_mode in ("stride", "hier", "approx", "exact",
                                    "seg"), (
            f"kernel_unroll unsupported with pool_mode={params.pool_mode}"
        )
        assert params.stream_frac >= 1.0, (
            "kernel_unroll with stream_frac < 1 is unsupported"
        )
    scores = score_grouped_pallas(
        index.doc_tiles_aligned,
        index.tile_scale3d,
        qloc,
        work_region,
        work_g,
        work_s,
        LLMAX,
        interpret=interpret,
        compute_dtype=params.compute_dtype,
        qsum=qsum,
        csub=csub,
        pack_idx=pack_idx,
        pack_window=rk,
        unroll=params.kernel_unroll,
    )  # [G_cap, M, LLMAX] f32 (or packed int32 [G_cap, M, LLMAX // rk]
    # when pool_mode is "window"/"stride"; work-item-major [W_cap, M,
    # STEP] when kernel_unroll > 1)
    if params.stop_after == "kernel":
        return scores, scores
    NSUP_ALL = LLMAX // (csub * SUB)

    # bin-packed regions (pack_bins views): rows [0, row_off) of a pair's
    # kernel window belong to bin-mates — scored against the WRONG qloc,
    # so they must be masked before any pooling. plan.pair_len /
    # group_nrows are already EFFECTIVE (row_off + len) upper bounds.
    roff_pair = roff_group = None
    if index.list_row_off is not None:
        assert not pack_idx, (
            "pool_mode 'window'/'stride' folds bin-mates' rows in-kernel; "
            "unsupported with bin-packed (pack_bins) views"
        )
        assert streamed is None, (
            "stream_frac < 1 is unsupported with bin-packed views"
        )
        nl = index.list_row_off.shape[0]
        roff_pair = jnp.take(
            index.list_row_off, jnp.clip(plan.pair_list, 0, nl - 1)
        )  # [B, QC]
        roff_group = jnp.take(
            index.list_row_off, jnp.clip(plan.group_list, 0, nl - 1)
        )  # [G_cap]

    pool = min(params.pool if params.pool > 0 else 8 * k, QC * LLMAX)
    if pack_idx:
        # ---- packed-index window pool: one reduce_window on the slot
        # grid selects each window's best (score, offset); the regroup
        # then moves only [B*QC, NW] int32 (vs [B*QC, LLMAX] f32) ----
        if streamed is not None:
            raise NotImplementedError(
                "pool_mode='window'/'stride' with stream_frac < 1 is "
                "unsupported"
            )
        idx_bits = max(1, (LLMAX - 1).bit_length())
        imask = (1 << idx_bits) - 1
        if params.pool_mode == "stride":
            # regroup-FIRST design: the slot grid is mostly padded slots
            # (~68% at bench shapes), so the pair gather — which reads
            # only real pairs' rows — runs before any full-width
            # reduction. The kernel already collapsed rk rows >= 128
            # apart per output col; the remaining stride max (rows >= 32
            # apart WITHIN one work item — always different k-means
            # blocks, so the conflated docs are dissimilar) runs here on
            # the pair-major array. Garbage cols (items beyond a pair's
            # list coverage, never written by the kernel) only conflate
            # with same-item garbage, and are masked below by the item's
            # start row vs the pair's list length.
            ROWS = csub * SUB
            step_k = ROWS // rk
            Wk = LLMAX // rk
            if item_major:
                pw = _item_regroup(scores, plan, csub, NSUP_ALL).reshape(
                    B, QC, Wk
                )
            else:
                pw = scores.reshape(G_cap * M, Wk)[
                    plan.pair_slot.reshape(B * QC)
                ].reshape(B, QC, Wk)
            rx = max(1, min(params.pool_stride // rk, step_k // 32))
            if rx > 1:
                S = Wk // step_k
                stepx = step_k // rx
                pw = pw.reshape(B, QC, S, rx, stepx).max(axis=3).reshape(
                    B, QC, S * stepx
                )
            NW = Wk // rx
            stepf = step_k // rx
            s_row = (
                jnp.arange(NW, dtype=jnp.int32) // stepf
            ) * ROWS  # [NW] super-tile start row per col
            off = pw & jnp.int32(imask)
            val = jax.lax.bitcast_convert_type(
                pw & jnp.int32(~imask), jnp.float32
            )
            if pair_scale is not None:
                val = val * pair_scale.reshape(B, QC, 1)
            ok = (
                plan.pair_valid[:, :, None]
                & (s_row[None, None, :] < plan.pair_len[:, :, None])
                & (off < plan.pair_len[:, :, None])
            )
            val = jnp.where(ok, val, -jnp.inf)
        else:
            WP = params.pool_window
            NW = LLMAX // WP
            wmax = jax.lax.reduce_window(
                scores,
                jnp.int32(-(2**31) + 1),
                jax.lax.max,
                (1, 1, WP),
                (1, 1, WP),
                "VALID",
            )  # [G_cap, M, NW] packed int32
            # windows in a group's UNWRITTEN output tail (beyond its work
            # items' coverage) hold random bits — mask by group length
            win_real = (
                jnp.arange(NW, dtype=jnp.int32)[None, :] * WP
                < plan.group_nrows[:, None]
            )  # [G_cap, NW]
            neg_inf_bits = jnp.int32(np.float32(-np.inf).view(np.int32))
            wmax = jnp.where(win_real[:, None, :], wmax, neg_inf_bits)
            pw = wmax.reshape(G_cap * M, NW)[
                plan.pair_slot.reshape(B * QC)
            ].reshape(B, QC, NW)
            off = pw & jnp.int32(imask)
            val = jax.lax.bitcast_convert_type(
                pw & jnp.int32(~imask), jnp.float32
            )
            if pair_scale is not None:
                val = val * pair_scale.reshape(B, QC, 1)
            # garbage windows (rows past the list / uninitialized kernel
            # cells) surface offsets >= the pair's list length — one mask
            # replaces the pre-pool full-width row masking
            ok = plan.pair_valid[:, :, None] & (
                off < plan.pair_len[:, :, None]
            )
            val = jnp.where(ok, val, -jnp.inf)
        if params.stop_after == "regroup":
            return val, val
        gsel = (
            jnp.arange(QC, dtype=jnp.int32)[None, :, None] * LLMAX + off
        ).reshape(B, QC * NW)
        pool = min(pool, QC * NW)
        if params.pool_select == "approx" and pool < QC * NW:
            top_scores, p1 = jax.lax.approx_max_k(
                val.reshape(B, QC * NW), pool,
                recall_target=params.pool_recall,
            )
        else:
            top_scores, p1 = jax.lax.top_k(val.reshape(B, QC * NW), pool)
        sel = jnp.take_along_axis(gsel, p1, axis=1)
        qc_slot = sel // LLMAX
        offp = sel % LLMAX
        post_sel = (
            jnp.take_along_axis(plan.pair_pstart, qc_slot, axis=1) + offp
        )
        safe_post = jnp.clip(post_sel, 0, index.postings.shape[0] - 1)
        cand_ids = jnp.take(index.postings, safe_post)
        cand_ids = jnp.where(jnp.isfinite(top_scores), cand_ids, n_docs)
        if params.stop_after == "pool":
            return top_scores, cand_ids
        return _grouped_tail(
            index, params, q_comps, qv, top_c, top_v, sc,
            top_scores, cand_ids, safe_post, pool, interpret,
        )

    if params.pool_mode == "slot":
        # ---- pool on the kernel's slot grid, THEN regroup (tiny) ----
        # stage 1 (approx top-t per slot row) runs before the regroup, so
        # the [B*QC, LLMAX] full-width gather shrinks to [B*QC, t]. Rows
        # beyond the group's list length (or outside the streamed budget)
        # are masked on the slot grid; per-pair scale (i8) is re-applied
        # after the gather (monotone within a row, so stage-1 selection
        # commutes with it).
        t = min(params.pool_per_pair, LLMAX)
        rows = jnp.arange(LLMAX, dtype=jnp.int32)
        rows_ok_slot = rows[None, :] < plan.group_nrows[:, None]
        if roff_group is not None:
            rows_ok_slot &= rows[None, :] >= roff_group[:, None]
        if streamed is not None:
            rows_ok_slot &= jnp.repeat(streamed, csub * 128, axis=-1)
        slot_ok = plan.slot_b < B  # [G_cap, M]
        m3 = rows_ok_slot[:, None, :] & slot_ok[:, :, None]
        sl = jnp.where(m3, scores.astype(jnp.float32), -jnp.inf).reshape(
            G_cap * M, LLMAX
        )
        v1, i1 = jax.lax.approx_max_k(
            sl, t, recall_target=params.pool_recall
        )
        ps = plan.pair_slot.reshape(B * QC)
        v1p = v1[ps].reshape(B, QC, t)
        i1p = i1[ps].reshape(B, QC, t)
        if pair_scale is not None:
            v1p = v1p * pair_scale.reshape(B, QC, 1)
        v1p = jnp.where(plan.pair_valid[..., None], v1p, -jnp.inf)
        gsel = (
            jnp.arange(QC, dtype=jnp.int32)[None, :, None] * LLMAX + i1p
        ).reshape(B, QC * t)
        if params.stop_after == "regroup":
            return v1p, v1p
        pool = min(pool, QC * t)
        top_scores, p1 = jax.lax.top_k(v1p.reshape(B, QC * t), pool)
        sel = jnp.take_along_axis(gsel, p1, axis=1)
        qc_slot = sel // LLMAX
        off = sel % LLMAX
        post_sel = (
            jnp.take_along_axis(plan.pair_pstart, qc_slot, axis=1) + off
        )
        safe_post = jnp.clip(post_sel, 0, index.postings.shape[0] - 1)
        cand_ids = jnp.take(index.postings, safe_post)
        cand_ids = jnp.where(jnp.isfinite(top_scores), cand_ids, n_docs)
        if params.stop_after == "pool":
            return top_scores, cand_ids
        return _grouped_tail(
            index, params, q_comps, qv, top_c, top_v, sc,
            top_scores, cand_ids, safe_post, pool, interpret,
        )

    # ---- regroup score rows to query order (wide-row gather: HBM-speed
    # on this device) and pool per query, exactly like the round-1 tail ----
    pdt = (jnp.bfloat16 if params.pool_dtype == "bf16"
           else jnp.float32)
    if item_major:
        pv = _item_regroup(scores.astype(pdt), plan, csub,
                           NSUP_ALL).reshape(B, QC, LLMAX)
    else:
        pv = scores.astype(pdt).reshape(G_cap * M, LLMAX)[
            plan.pair_slot.reshape(B * QC)
        ].reshape(B, QC, LLMAX)
    if pair_scale is not None:
        pv = pv * pair_scale.reshape(B, QC, 1).astype(pdt)
    rows_ok = (
        jnp.arange(LLMAX, dtype=jnp.int32)[None, None, :]
        < plan.pair_len[..., None]
    ) & plan.pair_valid[..., None]
    if roff_pair is not None:
        rows_ok &= (
            jnp.arange(LLMAX, dtype=jnp.int32)[None, None, :]
            >= roff_pair[..., None]
        )
    if streamed is not None:
        # mask rows of super-tiles the budget skipped (their kernel output
        # rows are uninitialized)
        pair_group = plan.pair_slot // M  # [B, QC]
        st = streamed[jnp.minimum(pair_group, G_cap - 1)]  # [B, QC, NSUP]
        rows_ok &= jnp.repeat(st, csub * 128, axis=-1)
    pv = jnp.where(rows_ok, pv, -jnp.inf).reshape(B, QC * LLMAX)
    if params.stop_after == "regroup":
        return pv, pv

    # ---- per-query pool + dedup + overflow re-rank + top-k ----
    if params.pool_mode == "hier":
        # stage 1: top-t per (query, list) row — approx_max_k with small k
        # is much cheaper than one wide pass; stage 2: tiny exact merge
        t = min(params.pool_per_pair, LLMAX)
        pvr = pv.reshape(B * QC, LLMAX)
        v1, i1 = jax.lax.approx_max_k(
            pvr, t, recall_target=params.pool_recall
        )
        gsel = (
            jnp.arange(QC, dtype=jnp.int32)[None, :, None] * LLMAX
            + i1.reshape(B, QC, t)
        ).reshape(B, QC * t)
        v1 = v1.reshape(B, QC * t)
        pool = min(pool, QC * t)
        top_scores, p1 = jax.lax.top_k(v1, pool)
        sel = jnp.take_along_axis(gsel, p1, axis=1)
    elif (params.pool_mode == "seg"
          and pool * params.pool_seg_width < QC * LLMAX):
        # exact two-level segment pool (see GroupedParams.pool_mode docs):
        # the top-`pool` segments by max provably contain the exact
        # top-`pool` rows, so this equals pool_mode="exact" on unmasked
        # scores while replacing the full-wall PartialReduce/sort with
        # one max reduce + a [B, pool] top_k + a [B, pool*segw] top_k.
        segw = params.pool_seg_width
        assert (QC * LLMAX) % segw == 0, (QC, LLMAX, segw)
        nseg = (QC * LLMAX) // segw
        seg_max = pv.reshape(B, nseg, segw).max(axis=-1)
        _, seg_sel = jax.lax.top_k(seg_max, pool)  # [B, pool]
        row_idx = (
            seg_sel[:, :, None] * segw
            + jnp.arange(segw, dtype=jnp.int32)[None, None, :]
        ).reshape(B, pool * segw)
        rows = jnp.take_along_axis(pv, row_idx, axis=1)
        if params.pool_select == "approx":
            # trades the exact-containment guarantee's final sort for a
            # PartialReduce over the (already pool*segw-wide) gathered rows
            top_scores, p1 = jax.lax.approx_max_k(
                rows, pool, recall_target=params.pool_recall
            )
        else:
            top_scores, p1 = jax.lax.top_k(rows, pool)
        sel = jnp.take_along_axis(row_idx, p1, axis=1)
    elif params.pool_mode in ("approx", "seg") and pool < QC * LLMAX:
        top_scores, sel = jax.lax.approx_max_k(
            pv, pool, recall_target=params.pool_recall
        )
    else:
        top_scores, sel = jax.lax.top_k(pv, pool)
    # the tail (prerank order, margin diag, finite masks) runs in f32;
    # only the wall the pool SELECTED over was pool_dtype
    top_scores = top_scores.astype(jnp.float32)
    qc_slot = sel // LLMAX
    off = sel % LLMAX
    post_sel = jnp.take_along_axis(plan.pair_pstart, qc_slot, axis=1) + off
    safe_post = jnp.clip(post_sel, 0, index.postings.shape[0] - 1)
    cand_ids = jnp.take(index.postings, safe_post)
    cand_ids = jnp.where(jnp.isfinite(top_scores), cand_ids, n_docs)
    if params.stop_after == "pool":
        return top_scores, cand_ids
    return _grouped_tail(
        index, params, q_comps, qv, top_c, top_v, sc,
        top_scores, cand_ids, safe_post, pool, interpret,
    )


def _grouped_tail(
    index, params, q_comps, qv, top_c, top_v, sc,
    top_scores, cand_ids, safe_post, pool, interpret,
):
    """Shared post-pool tail: exact rescore (or overflow re-rank), dedup,
    k-NN refinement, final top-k."""
    from .engine import _dedup_by_id, _knn_refine, densify_query_batch

    k = params.k
    n_docs = index.n_docs

    if params.block_expand > 0:
        # block-summary view: pooled "posting rows" are BLOCK ids
        # (safe_post = list_block_start[pair] + offset); expand each into
        # its member postings and exact-rescore all of them
        assert not params.return_margin, (
            "return_margin is only implemented on the rescore path"
        )
        return _block_expand_tail(
            index, params, top_c, top_v, sc, top_scores, safe_post,
            interpret,
        )

    if params.rescore > 0:
        from ..ops.pallas_rescore import rescore_exact

        rp = min(params.rescore, pool)
        if params.dedup_mode == "post":
            # pool scores come back (approximately) sorted; rescore the
            # raw top-rp, dedup on exact scores afterwards
            t2 = top_scores[:, :rp]
            ids2 = cand_ids[:, :rp]
            if params.stop_after == "prerank":
                return t2, ids2
            approx2 = t2
            exact = rescore_exact(index, ids2, top_c, top_v, sc,
                                  interpret=interpret,
                                  chunk_r=params.rescore_chunk)
            t2 = jnp.where(jnp.isfinite(t2), exact, -jnp.inf)
            t2, ids2 = _dedup_by_id(t2, ids2, n_docs)
        else:
            dscores, dids, _ = _dedup_with_payload(
                top_scores, cand_ids, safe_post, n_docs
            )
            t2, pos2 = jax.lax.top_k(dscores, rp)
            ids2 = jnp.take_along_axis(dids, pos2, axis=1)
            if params.stop_after == "prerank":
                return t2, ids2
            approx2 = t2
            exact = rescore_exact(index, ids2, top_c, top_v, sc,
                                  interpret=interpret,
                                  chunk_r=params.rescore_chunk)
            t2 = jnp.where(jnp.isfinite(t2), exact, -jnp.inf)
        out_scores, opos = jax.lax.top_k(t2, k)
        out_ids = jnp.take_along_axis(ids2, opos, axis=1)

        if params.n_knn > 0 and index.knn is not None:
            out_scores, out_ids = _knn_refine_grouped(
                index, params, top_c, top_v, sc, out_scores, out_ids,
                interpret,
            )
        out_ids = jnp.where(jnp.isfinite(out_scores), out_ids, -1)
        if params.return_margin:
            # per-query pool-truncation DIAGNOSTICS (search/twopass.py
            # computes the flag margin on host — the signal choice is a
            # calibration question, probe_r5a round 5): a pool-missed
            # doc's APPROX score is below the pool bottom; its EXACT
            # score is at most pool_bottom + (this query's approx->exact
            # truncation gap). Columns:
            #   0 kth exact score
            #   1 pool bottom (scaled approx; -inf when pool unfilled)
            #   2 mean  exact-approx gap over the rescored set
            #   3 max   exact-approx gap over the rescored set
            #   4 pool bottom-quartile score range (near-cut density:
            #     a tiny range means the tail beyond the pool is dense)
            finite2 = jnp.isfinite(approx2) & jnp.isfinite(exact)
            cnt = jnp.maximum(jnp.sum(finite2, axis=1), 1)
            gap = jnp.where(finite2, exact - approx2, 0.0)
            bias_mean = jnp.sum(gap, axis=1) / cnt
            bias_max = jnp.max(
                jnp.where(finite2, gap, -jnp.inf), axis=1
            )
            pool_bottom = top_scores[:, -1]
            P4 = (3 * top_scores.shape[1]) // 4
            q4range = top_scores[:, P4] - pool_bottom
            kth = out_scores[:, k - 1]
            diag = jnp.stack(
                [kth, pool_bottom, bias_mean, bias_max, q4range], axis=1
            )
            return out_scores, out_ids, diag
        return out_scores, out_ids

    assert not params.return_margin, (
        "return_margin requires rescore > 0 (the margin's bias estimate "
        "needs the exact-vs-approx rescore gap)"
    )
    use_ovf = params.use_ovf and index.tile_ovf_comps is not None
    if use_ovf and 0 < params.ovf_pool < pool:
        # dedup first, then correct only the top unique candidates
        dscores, dids, dpost = _dedup_with_payload(
            top_scores, cand_ids, safe_post, n_docs
        )
        t2, pos2 = jax.lax.top_k(dscores, params.ovf_pool)
        ids2 = jnp.take_along_axis(dids, pos2, axis=1)
        post2 = jnp.take_along_axis(dpost, pos2, axis=1)
        t2 = _ovf_correction(index, top_c, top_v, t2, post2)
        out_scores, opos = jax.lax.top_k(t2, k)
        out_ids = jnp.take_along_axis(ids2, opos, axis=1)
    else:
        if use_ovf:
            top_scores = _ovf_correction(
                index, top_c, top_v, top_scores, safe_post
            )
        dscores, dids = _dedup_by_id(top_scores, cand_ids, n_docs)
        out_scores, opos = jax.lax.top_k(dscores, k)
        out_ids = jnp.take_along_axis(dids, opos, axis=1)

    if params.n_knn > 0 and index.knn is not None:
        from .engine import SearchParams

        qd = densify_query_batch(q_comps, qv, index.dim)
        out_scores, out_ids = _knn_refine(
            index,
            SearchParams(k=k, n_knn=params.n_knn),
            qd,
            out_scores,
            out_ids,
        )

    out_ids = jnp.where(jnp.isfinite(out_scores), out_ids, -1)
    return out_scores, out_ids


def _block_expand_tail(
    index, params, top_c, top_v, sc, blk_scores, blk_sel, interpret,
):
    """Expand pooled BLOCKS into member postings and exact-rescore all of
    them (reference `evaluate_posting_block`, posting_list.rs:188-215:
    every posting of a gated block gets a full sparse dot). Duplicate
    docs (several selected lists/blocks) rescore identically; a cheap
    prerank-then-dedup keeps the wide sort off the [B, pool*E] array."""
    from ..ops.pallas_rescore import rescore_exact
    from .engine import _dedup_by_id

    k = params.k
    n_docs = index.n_docs
    B, P = blk_sel.shape
    E = params.block_expand
    nb = index.block_start.shape[0]
    blk = jnp.clip(blk_sel, 0, nb - 1)
    bs = jnp.take(index.block_start, blk)  # [B, P]
    bl = jnp.take(index.block_len, blk)
    j = jnp.arange(E, dtype=jnp.int32)
    valid = (j[None, None, :] < bl[:, :, None]) & jnp.isfinite(
        blk_scores
    )[:, :, None]
    pidx = jnp.clip(bs[:, :, None] + j, 0, index.postings.shape[0] - 1)
    ids = jnp.take(index.postings, pidx)  # [B, P, E]
    ids = jnp.where(valid, ids, n_docs).reshape(B, P * E)
    # sequential column chunks (lax.map = scan) inside rescore_exact: one
    # [B*C, W] forward gather live at a time, so deep block pools fit HBM
    exact = rescore_exact(index, ids, top_c, top_v, sc,
                          interpret=interpret,
                          chunk_r=params.rescore_chunk)
    exact = jnp.where(ids < n_docs, exact, -jnp.inf)
    # duplicates carry EQUAL exact scores, so the top-`dd` raw entries
    # contain the true top-k unless > dd - k duplicates outrank it; dd
    # is sized so that even the worst case (each of the top docs
    # appearing in every selected list) keeps the true top-k inside
    dd = min(P * E, max(8 * k, 128))
    t2, pos2 = jax.lax.top_k(exact, dd)
    ids2 = jnp.take_along_axis(ids, pos2, axis=1)
    dscores, dids = _dedup_by_id(t2, ids2, n_docs)
    out_scores, opos = jax.lax.top_k(dscores, k)
    out_ids = jnp.take_along_axis(dids, opos, axis=1)
    if params.n_knn > 0 and index.knn is not None:
        out_scores, out_ids = _knn_refine_grouped(
            index, params, top_c, top_v, sc, out_scores, out_ids,
            interpret,
        )
    out_ids = jnp.where(jnp.isfinite(out_scores), out_ids, -1)
    return out_scores, out_ids


@functools.partial(jax.jit, static_argnames=("params",))
def search_grouped_jit(index, plan, q_comps, q_vals, params):
    return _grouped_impl(index, plan, q_comps, q_vals, params)


@functools.partial(
    jax.jit,
    static_argnames=(
        "params", "query_cut", "M", "G_cap", "W_cap", "zero_region",
        "weighted",
    ),
)
def search_grouped_derive_jit(
    index, q_comps, q_vals, params, query_cut, M, G_cap, W_cap,
    zero_region, weighted=False,
):
    """One fused program: device-side plan derivation + grouped search.
    Only the queries cross host->device; the host supplies G_cap/W_cap
    (static, bucketed — from the native planner's counts, which run
    overlapped with the previous batch)."""
    plan = derive_plan_device(
        index, q_comps, q_vals, query_cut, M, G_cap, W_cap, zero_region,
        weighted=weighted,
    )
    return _grouped_impl(index, plan, q_comps, q_vals, params)


def plan_caps(q_comps, q_vals, ctx, query_cut: int, M: int = 8,
              weighted: bool = False):
    """Host-side (G_cap, W_cap) for the device-derived plan — exact G/W
    from the native planner, rounded to jit-stable buckets. With
    `weighted`, the same value * list-weight selection as
    derive_plan_device (the selections must match for the caps to be
    exact)."""
    from .planner import plan_grouped

    if weighted:
        if ctx.list_weight is None:
            raise ValueError("weighted caps need ctx.list_weight")
        q_comps = np.asarray(q_comps)
        w = np.where(
            (q_comps >= 0) & (q_comps < ctx.n_lists),
            ctx.list_weight[np.clip(q_comps, 0, ctx.n_lists - 1)], 0.0,
        )
        # scale values so the native planner's top-QC picks the weighted
        # order; validity checks (v > 0) are preserved because w >= 0
        q_vals = np.asarray(q_vals) * w
    p = plan_grouped(q_comps, q_vals, ctx, query_cut, M=M)
    return p.G_cap, p.W_cap


def search_grouped(
    index: DeviceIndex,
    ctx: PlannerContext,
    q_comps: np.ndarray,
    q_vals: np.ndarray,
    params: GroupedParams,
    query_cut: int = 10,
    M: int = 8,
):
    """Convenience wrapper: plan on host, execute on device, numpy out."""
    plan = plan_grouped(q_comps, q_vals, ctx, query_cut, M=M)
    dplan = DevicePlan.put(plan)
    scores, ids = search_grouped_jit(
        index,
        dplan,
        jnp.asarray(q_comps, jnp.int32),
        jnp.asarray(q_vals, jnp.float32),
        params,
    )
    return np.asarray(scores), np.asarray(ids)
