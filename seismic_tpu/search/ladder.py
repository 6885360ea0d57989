"""Vocab ladder: per-list adaptive local-vocabulary width (round 3).

At reference scale the single-width local vocab is the recall ceiling:
at 1M docs, recall@10 tops out ~0.92 at V=512 and ~0.954 at V=1024
(SCALE_BENCH.json) because a 400-posting list can span >10K distinct
terms and the dense tile truncates the rest. Doubling V globally doubles
tile HBM (V=2048 would not fit). The ladder instead classes each list by
its measured vocabulary demand (build-time `vocab_csum` coverage
metadata) and builds per-class tile pools:

    class 0: V=512  — lists whose top-512 terms cover >= `coverage` of
                      their total term mass (most lists on Zipfian data)
    class 1: V=1024 — middling lists
    class 2: V=2048 — the diverse heavy hitters

Short-vocab lists get CHEAPER (half the DMA bytes per row, smaller
LLMAX pool width); diverse lists get the width they need. Memory can
DROP versus a global V=1024 while recall rises.

The search runs the grouped pipeline per class (each class has its own
plan, qloc projection at V_c, Pallas kernel over its tile pool, and
stride pool), then concatenates the per-class candidate pools into the
shared exact-rescore tail (grouped.py::_grouped_tail). Scores from
different classes are comparable (all are truncated dot products; the
exact rescore fixes the final ranking).

Reference parity: the reference has no analogue — its per-posting scan
reads exact forward values (posting_list.rs:188-215). The ladder is the
TPU-native answer at the same recall envelope: dense MXU tiles where
they are cheap, wider tiles only where the data demands them.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np

from ..data.sparse import PAD_COMPONENT
from ..ops.pallas_tiles import SUB

# fixed coverage grid emitted by the builder (build/builder.py)
from ..build.builder import VOCAB_CSUM_GRID


# --------------------------------------------------------------------- types
@dataclass
class LadderClass:
    """Device arrays of one ladder class (pytree; V/ll_max/zero_region are
    static aux)."""

    tiles: object  # int8 [rows_c, V]
    scale3d: object  # f32 [n_super_c, 8, csub*128]
    region_start: object  # int32 [n_lists] subtile units (class lists only)
    vocab16: object  # int16 [n_lists, V] (-1 padded; class lists only)
    list_len: object  # int32 [n_lists] (0 for other classes' lists)
    V: int = 0
    ll_max: int = 0
    zero_region: int = 0


def _register_ladder_class():
    import jax

    def flatten(c):
        return (
            (c.tiles, c.scale3d, c.region_start, c.vocab16, c.list_len),
            (c.V, c.ll_max, c.zero_region),
        )

    def unflatten(aux, ch):
        return LadderClass(
            tiles=ch[0], scale3d=ch[1], region_start=ch[2], vocab16=ch[3],
            list_len=ch[4], V=aux[0], ll_max=aux[1], zero_region=aux[2],
        )

    jax.tree_util.register_pytree_node(LadderClass, flatten, unflatten)


_register_ladder_class()


# ---------------------------------------------------------------- host prep
def assign_classes(arrays, vclasses, coverage: float = 0.995) -> np.ndarray:
    """Per-list ladder class: the smallest V_c that either holds the
    list's whole vocabulary or covers >= `coverage` of its total term
    mass (build-time vocab_csum metadata). Returns int8 [n_lists]."""
    if arrays.vocab_csum is None or arrays.vocab_rank is None:
        raise ValueError(
            "index lacks vocab ladder metadata (vocab_rank/vocab_csum); "
            "rebuild with this version or use a single-width upload"
        )
    lv = np.asarray(arrays.list_vocab)
    valid = (lv >= 0) & (lv != PAD_COMPONENT)
    n_real = valid.sum(axis=1)
    csum = np.asarray(arrays.vocab_csum)
    n_lists = lv.shape[0]
    cls = np.full(n_lists, len(vclasses) - 1, np.int8)
    for c in range(len(vclasses) - 2, -1, -1):
        vc = vclasses[c]
        gi = VOCAB_CSUM_GRID.index(vc)
        ok = (n_real <= vc) | (csum[:, gi] >= coverage)
        cls = np.where(ok, np.int8(c), cls)
    return cls


def prepare_ladder(arrays, vclasses, coverage: float = 0.995,
                   csub: int = 1):
    """Build per-class aligned tile pools from a single-width build.

    The build must have used summary_vocab_cap >= max(vclasses); each
    class-c list's tile rows are the importance-top-V_c column subset of
    its full-width rows (vocab_rank metadata; u8 codes and row scales
    are unchanged, so no requantization). Returns
    (list_class int8 [n_lists], [per-class host dicts])."""
    from ..ops_pallas_prep import ll_pad_for

    for vc in vclasses:
        if vc not in VOCAB_CSUM_GRID:
            raise ValueError(f"ladder width {vc} not in {VOCAB_CSUM_GRID}")
        if vc % 128:
            raise ValueError("ladder widths must be multiples of 128")
    v_built = arrays.list_vocab.shape[1]
    if max(vclasses) > v_built:
        raise ValueError(
            f"ladder max {max(vclasses)} exceeds built vocab width "
            f"{v_built}; rebuild with summary_vocab_cap={max(vclasses)}"
        )
    list_class = assign_classes(arrays, vclasses, coverage)
    list_len = np.asarray(arrays.list_len, np.int64)
    list_post_start = np.asarray(arrays.list_post_start, np.int64)
    lv = np.asarray(arrays.list_vocab)
    vr = np.asarray(arrays.vocab_rank)
    tiles_all = np.asarray(arrays.doc_tiles)
    scale_all = np.asarray(arrays.doc_tile_scale)
    n_lists = len(list_len)
    unit = csub * SUB

    out = []
    for c, V_c in enumerate(vclasses):
        sel = (list_class == c) & (list_len > 0)
        lists_c = np.flatnonzero(sel)
        max_len_c = int(list_len[lists_c].max()) if len(lists_c) else 0
        ll_max_c = ll_pad_for(max_len_c, csub)
        nsub = np.zeros(n_lists, np.int64)
        nsub[lists_c] = (
            -(-np.maximum(1, -(-list_len[lists_c] // SUB)) // csub) * csub
        )
        region_start = np.zeros(n_lists, np.int64)
        if len(lists_c):
            region_start[lists_c] = np.concatenate(
                [[0], np.cumsum(nsub[lists_c])[:-1]]
            )
        rows_c = int(nsub.sum()) * SUB + ll_max_c
        tiles_c = np.zeros((rows_c, V_c), np.uint8)
        scale_c = np.zeros(rows_c, np.float32)
        vocab_c = np.full((n_lists, V_c), -1, np.int16)
        for l in lists_c:
            ln = int(list_len[l])
            ps = int(list_post_start[l])
            cols = np.flatnonzero(
                (vr[l] < V_c) & (lv[l] >= 0) & (lv[l] != PAD_COMPONENT)
            )
            dst = int(region_start[l]) * SUB
            tiles_c[dst:dst + ln, :len(cols)] = (
                tiles_all[ps:ps + ln][:, cols]
            )
            scale_c[dst:dst + ln] = scale_all[ps:ps + ln]
            vocab_c[l, :len(cols)] = lv[l, cols].astype(np.int16)
        n_super = rows_c // unit
        scale3d = np.repeat(
            scale_c.reshape(n_super, 1, unit), 8, axis=1
        ).astype(np.float32)
        out.append(dict(
            tiles=tiles_c.view(np.int8),
            scale3d=scale3d,
            region_start=region_start.astype(np.int32),
            vocab16=vocab_c,
            list_len=np.where(sel, list_len, 0).astype(np.int32),
            V=V_c,
            ll_max=ll_max_c,
            zero_region=n_super - 1,
        ))
    return list_class, out


def ladder_contexts(arrays, list_class, class_hosts, csub: int = 1):
    """Per-class PlannerContext for host planning/caps: other classes'
    lists get length 0, so the existing planners drop their pairs."""
    from .planner import PlannerContext

    ctxs = []
    for h in class_hosts:
        ctxs.append(PlannerContext(
            list_region_start=h["region_start"],
            list_len=h["list_len"],
            list_post_start=np.asarray(arrays.list_post_start, np.int32),
            n_lists=arrays.n_lists,
            n_docs=arrays.n_docs,
            zero_region=h["zero_region"],
            csub=csub,
            list_weight=None,
        ))
    return ctxs


# --------------------------------------------------------------- search
def _class_pool(index, lc: LadderClass, plan, q_comps, top_c, top_v,
                scq: int, params, interpret: bool):
    """One ladder class's grouped pipeline up to the candidate pool:
    qloc projection at V_c -> i8 expand -> Pallas tile kernel over the
    class pool -> stride pool (regroup-first). Returns
    (top_scores [B, pool], cand_ids, safe_post) with global doc ids."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas_grouped import score_grouped_pallas
    from ..ops.pallas_qloc import LANES, project_qloc_pallas
    from .grouped import DevicePlan, _item_regroup

    if isinstance(plan, DevicePlan):
        plan = plan.view()
    B, Q = q_comps.shape
    G_cap, M = plan.slot_b.shape
    csub = index.tile_csub
    LLMAX = lc.ll_max
    QC = plan.pair_list.shape[1]
    n_docs = index.n_docs

    # ---- qloc at V_c ----
    P = B * QC
    P_cap = -(-P // LANES) * LANES
    pair_list_flat = plan.pair_list.reshape(P)
    vocabT = lc.vocab16[pair_list_flat].T  # [V_c, P]
    SCP = -(-scq // 8) * 8
    qcT = jnp.broadcast_to(
        top_c[:, None, :scq], (B, QC, scq)
    ).reshape(P, scq).T
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
    qlocT = project_qloc_pallas(vocabT, qcT, qvT, scq, interpret=interpret)
    amaxT = jnp.max(jnp.abs(qlocT), axis=0, keepdims=True)
    qscaleT = jnp.maximum(amaxT, 1e-20) / 127.0
    q_i8 = jnp.round(qlocT / qscaleT).astype(jnp.int8).T[:P]
    pair_scale = qscaleT[0, :P]
    qloc = q_i8[plan.slot_pair].reshape(G_cap, M, lc.V)

    # ---- kernel (packed stride output) ----
    rk = max(1, min(params.pool_stride, (csub * SUB) // 128))
    scores = score_grouped_pallas(
        lc.tiles, lc.scale3d, qloc,
        plan.work_region, plan.work_g, plan.work_s,
        LLMAX, interpret=interpret, compute_dtype="i8",
        csub=csub, pack_idx=True, pack_window=rk,
        unroll=params.kernel_unroll,
    )  # packed int32 [G_cap, M, LLMAX // rk] (work-item-major
    # [W_cap, M, ROWS // rk] when kernel_unroll > 1)

    # ---- stride pool, regroup-first ----
    idx_bits = max(1, (LLMAX - 1).bit_length())
    imask = (1 << idx_bits) - 1
    ROWS = csub * SUB
    step_k = ROWS // rk
    Wk = LLMAX // rk
    if params.kernel_unroll > 1:
        pw = _item_regroup(scores, plan, csub, LLMAX // ROWS).reshape(
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
    s_row = (jnp.arange(NW, dtype=jnp.int32) // stepf) * ROWS
    off = pw & jnp.int32(imask)
    val = jax.lax.bitcast_convert_type(pw & jnp.int32(~imask), jnp.float32)
    val = val * pair_scale.reshape(B, QC, 1)
    ok = (
        plan.pair_valid[:, :, None]
        & (s_row[None, None, :] < plan.pair_len[:, :, None])
        & (off < plan.pair_len[:, :, None])
    )
    val = jnp.where(ok, val, -jnp.inf)
    pool = min(params.pool if params.pool > 0 else 8 * params.k, QC * NW)
    if params.pool_select == "approx" and pool < QC * NW:
        top_scores, p1 = jax.lax.approx_max_k(
            val.reshape(B, QC * NW), pool, recall_target=params.pool_recall
        )
    else:
        top_scores, p1 = jax.lax.top_k(val.reshape(B, QC * NW), pool)
    gsel = (
        jnp.arange(QC, dtype=jnp.int32)[None, :, None] * LLMAX + off
    ).reshape(B, QC * NW)
    sel = jnp.take_along_axis(gsel, p1, axis=1)
    qc_slot = sel // LLMAX
    offp = sel % LLMAX
    post_sel = jnp.take_along_axis(plan.pair_pstart, qc_slot, axis=1) + offp
    safe_post = jnp.clip(post_sel, 0, index.postings.shape[0] - 1)
    cand_ids = jnp.take(index.postings, safe_post)
    cand_ids = jnp.where(jnp.isfinite(top_scores), cand_ids, n_docs)
    return top_scores, cand_ids, safe_post


def _ladder_impl(index, plans, q_comps, q_vals, params):
    """Full ladder search: per-class pools + the shared exact-rescore
    tail. `plans` is one plan per ladder class."""
    import jax
    import jax.numpy as jnp

    from .grouped import _grouped_tail

    assert index.ladder is not None, "index uploaded without ladder"
    assert len(plans) == len(index.ladder)
    B, Q = q_comps.shape
    valid_q = q_comps != PAD_COMPONENT
    qv = jnp.where(valid_q, q_vals, 0.0)
    sc = min(params.score_cut, Q)
    if sc < Q:
        top_v, top_p = jax.lax.top_k(qv, sc)
        top_c = jnp.take_along_axis(q_comps, top_p, axis=1)
    else:
        top_v, top_c = qv, q_comps
    scq = min(params.qloc_cut, sc) if params.qloc_cut > 0 else sc
    interpret = jax.default_backend() != "tpu"

    ts, ci, sp = [], [], []
    for lc, plan in zip(index.ladder, plans):
        t, c, p = _class_pool(
            index, lc, plan, q_comps, top_c, top_v, scq, params, interpret
        )
        ts.append(t)
        ci.append(c)
        sp.append(p)
    top_scores = jnp.concatenate(ts, axis=1)
    cand_ids = jnp.concatenate(ci, axis=1)
    safe_post = jnp.concatenate(sp, axis=1)
    return _grouped_tail(
        index, params, q_comps, qv, top_c, top_v, sc,
        top_scores, cand_ids, safe_post, top_scores.shape[1], interpret,
    )


def search_ladder(index, ctxs, q_comps, q_vals, params, query_cut: int = 10,
                  M: int = 8):
    """Host-planned ladder search (numpy in/out): one plan per class via
    the per-class PlannerContexts (other classes' lists have length 0
    there, so each plan covers exactly its class's pairs)."""
    import functools

    import jax
    import jax.numpy as jnp

    from .grouped import DevicePlan
    from .planner import plan_grouped

    plans = tuple(
        DevicePlan.put(plan_grouped(q_comps, q_vals, ctx, query_cut, M=M))
        for ctx in ctxs
    )
    scores, ids = _ladder_jit(
        index, plans,
        jnp.asarray(q_comps, jnp.int32),
        jnp.asarray(q_vals, jnp.float32),
        params,
    )
    return np.asarray(scores), np.asarray(ids)


def _ladder_jit(index, plans, q_comps, q_vals, params):
    import jax

    return jax.jit(
        _ladder_impl, static_argnames=("params",)
    )(index, plans, q_comps, q_vals, params)
