"""Two-pass adaptive pooled search (round 5).

The reference's sequential heap threshold adapts WORK per query: a block
is skipped exactly when its summary bound cannot beat the CURRENT kth
score (reference src/posting_list.rs:130,169), so easy queries stop
scoring early and hard queries keep digging. The batched TPU program
instead pays one FIXED pool depth for every query — and the 1M miss
decomposition (docs/Roadmap.md round-4 state: present-doc pool depth
p90=11, p99=125, p999=583) shows a fixed pool must pay the p999 worst
case everywhere to hit high recall.

The TPU-native recast is two jitted programs with a host compaction
between them (no data-dependent control flow inside either program):

  pass 1  cheap fixed program (p64-96) over the full batch, returning a
          per-query pool-truncation MARGIN (GroupedParams.return_margin:
          kth exact score minus the bias-corrected pool bottom)
  host    flag margin < eps (+ eps_rel * kth); compact the flagged
          queries (the skewed few percent) into one fixed-size batch
  pass 2  deep fixed program (p512-2048, wider query_cut, optional knn)
          over the compacted batch; results replace the flagged rows

Average cost ~= pass-1 cost + (flagged fraction) x deep cost. Both
programs have static shapes, so each compiles once per batch class.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..types import DeviceIndex
from .grouped import GroupedParams, plan_caps, search_grouped_derive_jit
from .planner import PlannerContext


@dataclass(frozen=True)
class TwoPassParams:
    """Configuration of the adaptive two-pass driver."""

    pass1: GroupedParams
    pass2: GroupedParams
    query_cut1: int = 14
    query_cut2: int = 20
    # flag a query when margin < eps + eps_rel * max(kth, 0): eps is an
    # absolute exact-score-unit threshold, eps_rel scales with the
    # query's own score range (SPLADE dot magnitudes vary per query)
    eps: float = 0.0
    eps_rel: float = 0.05
    # margin signal (host-computed from the device diag; probe_r5a
    # calibration): "bias_mean" = kth - (pool_bottom + mean gap) — the
    # optimistic estimate; "bias_max" = kth - (pool_bottom + max gap) —
    # the conservative bound (a missed doc is precisely one whose
    # truncation gap is above average, so the mean under-flags)
    flag_mode: str = "bias_mean"
    # pass-2 batch capacity as a fraction of the pass-1 batch (static
    # shape: compiled once per (B, b2_frac); overflow keeps the
    # worst-margin queries, so the cap degrades recall gracefully)
    b2_frac: float = 0.125
    b2_min: int = 128
    M: int = 8

    def __post_init__(self):
        if self.pass1.rescore <= 0:
            raise ValueError("pass1 must use the exact-rescore tail "
                             "(rescore > 0) to produce a margin")
        if self.pass1.k != self.pass2.k:
            raise ValueError("pass1.k != pass2.k")


def margin_from_diag(diag: np.ndarray, flag_mode: str) -> np.ndarray:
    """Per-query flag margin from the device diagnostics (GroupedParams.
    return_margin; columns: kth, pool_bottom, gap_mean, gap_max,
    pool-bottom-quartile range). An unfilled pool (bottom = -inf) means
    nothing was truncated: margin = +inf."""
    kth, bottom = diag[:, 0], diag[:, 1]
    if flag_mode == "bias_mean":
        m = kth - (bottom + diag[:, 2])
    elif flag_mode == "bias_max":
        m = kth - (bottom + diag[:, 3])
    else:
        raise ValueError(f"unknown flag_mode {flag_mode!r}")
    return np.where(np.isfinite(bottom), m, np.inf)


def search_batch_twopass(
    index: DeviceIndex,
    ctx: PlannerContext,
    q_comps: np.ndarray,  # [B, Q] int32, PAD_COMPONENT padded
    q_vals: np.ndarray,  # [B, Q] f32
    tp: TwoPassParams,
    knn_index: DeviceIndex | None = None,
):
    """Adaptive batch search; returns (scores, ids, stats).

    `knn_index` optionally supplies a graph-attached index for pass 2
    only (pass 1 stays graph-free — the graph gather is part of the
    deep program's budget, not the cheap one's).
    """
    B = q_comps.shape[0]
    p1 = dataclasses.replace(tp.pass1, return_margin=True)
    qd = jnp.asarray(q_comps, jnp.int32)
    vd = jnp.asarray(q_vals, jnp.float32)
    gc, wc = plan_caps(q_comps, q_vals, ctx, tp.query_cut1, M=tp.M)
    s1, i1, diag = search_grouped_derive_jit(
        index, qd, vd, p1, tp.query_cut1, tp.M, gc, wc, ctx.zero_region
    )
    s1 = np.asarray(s1)
    i1 = np.asarray(i1)
    margin = margin_from_diag(np.asarray(diag), tp.flag_mode)

    kth = s1[:, tp.pass1.k - 1]
    flagged = np.nonzero(
        margin < tp.eps + tp.eps_rel * np.maximum(kth, 0.0)
    )[0]
    B2 = min(B, max(tp.b2_min, int(round(tp.b2_frac * B))))
    if len(flagged) > B2:
        # cap overflow: keep the lowest-margin (most at-risk) queries
        flagged = flagged[np.argsort(margin[flagged])[:B2]]
    stats = {"flagged": int(len(flagged)), "b2": B2,
             "flag_frac": round(len(flagged) / max(B, 1), 4),
             "flagged_idx": flagged, "margin": margin}
    if len(flagged) == 0:
        return s1, i1, stats

    # compact into the fixed-size pass-2 batch (pad rows re-run query 0;
    # their results are discarded)
    sel = np.zeros(B2, np.int64)
    sel[: len(flagged)] = flagged
    q2c, q2v = q_comps[sel], q_vals[sel]
    gc2, wc2 = plan_caps(q2c, q2v, ctx, tp.query_cut2, M=tp.M)
    ix2 = knn_index if (knn_index is not None
                        and tp.pass2.n_knn > 0) else index
    s2, i2 = search_grouped_derive_jit(
        ix2, jnp.asarray(q2c, jnp.int32), jnp.asarray(q2v, jnp.float32),
        tp.pass2, tp.query_cut2, tp.M, gc2, wc2, ctx.zero_region
    )
    out_s, out_i = s1.copy(), i1.copy()
    out_s[flagged] = np.asarray(s2)[: len(flagged)]
    out_i[flagged] = np.asarray(i2)[: len(flagged)]
    return out_s, out_i, stats
