"""Pallas TPU kernel: exact candidate re-scoring from forward-index rows.

For each candidate document (gathered as a padded forward row of component
ids + decoded f32 values), computes the EXACT dot product with the query:

    score[b, r] = sum_w vals[b, r, w] * qv[b, i] * [comps[b, r, w] == qc[b, i]]

Layout (v2, row-major): one grid step per query; the step's block holds the
query's R candidate rows [R, W] (comps + vals), and the query's top-sc terms
arrive via scalar prefetch (qc int32, qv f32 SMEM scalars) so each compare
is a free scalar splat against the [R, W] tile. This avoids the [B*R, W] ->
[W, B*R] transposes the v1 lane-major layout required (two ~100 MB relayouts
that dominated its cost).

This one kernel serves three round-2 needs:
- final-pool exact re-rank (removes the u8 tile quantization error and the
  local-vocab truncation error from returned scores);
- TPU-fast k-NN refinement (reference Knn::refine,
  inverted_index.rs:551-593) — neighbor rows are wide-row gathers, which
  run at HBM speed on this device, then exact-scored here;
- the memory-parity mode: coarse ranking picks a pool, this kernel restores
  exact scores for the survivors.
"""

from __future__ import annotations

LANES = 128


def score_docs_rowmajor_pallas(
    comps,  # int32 [B, R, W] candidate forward rows (PAD-padded)
    vals,  # f32 [B, R, W] decoded values (0 at padding)
    qc_flat,  # int32 [B * SCP] query term ids (PAD-padded)
    qv_flat,  # f32 [B * SCP] query term values (f32 SMEM scalars work
    # on this device -- probed)
    sc: int,  # number of real term slots to scan
    interpret: bool = False,
):
    """Returns exact scores f32 [B, R_pad] (R padded up to 8)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R, W = comps.shape
    SCP = qc_flat.shape[0] // B
    assert R % 8 == 0 and W % LANES == 0
    assert sc <= SCP

    def kernel(qc_ref, qv_ref, comps_ref, vals_ref, out_ref):
        b = pl.program_id(0)
        c = comps_ref[0].astype(jnp.int32)  # [R, W] (widens the i16 twin)
        acc = jnp.zeros((R, W), jnp.float32)
        for i in range(sc):  # static unroll; scalar splat per term
            acc = acc + jnp.where(c == qc_ref[b * SCP + i],
                                  qv_ref[b * SCP + i], 0.0)
        # lane reduce -> [R, 1], lane-splat into the [R, LANES] out block
        s = jnp.sum(vals_ref[0] * acc, axis=1, keepdims=True)
        out_ref[0] = jnp.broadcast_to(s, (R, LANES))

    grid = (B,)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, R, W), lambda b, qc, qv: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, W), lambda b, qc, qv: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, R, LANES), lambda b, qc, qv: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, R, LANES), jnp.float32),
        interpret=interpret,
    )(qc_flat, qv_flat, comps, vals)
    return out[:, :, 0]


def rescore_exact(index, doc_ids, top_c, top_v, sc: int,
                  interpret: bool = False, chunk_r: int = 0):
    """Exact scores of `doc_ids` [B, R] against each row's query terms
    (top_c/top_v [B, >=sc]). Gathers forward rows (wide-row gather: HBM
    speed), decodes values, and runs the compare kernel. Returns f32
    [B, R].

    `chunk_r > 0` scores R in sequential column chunks (lax.map = scan):
    only one [B*chunk_r, W] forward gather is live at a time. The gather
    itself is row-count-bound so chunking costs ~nothing, but it bounds
    the stage's HLO temps — at the 1M W=1024 point (14.93 GB index on a
    16 GB chip) unchunked rescore>=384 or B=4096 programs outgrow the
    scratch headroom and fail to compile (round-5 r5c_deep/b4k: remote-
    compile HTTP 500 on every such program)."""
    import jax
    import jax.numpy as jnp

    from ..data.sparse import PAD_COMPONENT
    from ..search.engine import _decode_fwd_vals

    B, R = doc_ids.shape
    n_docs = index.n_docs
    if 0 < chunk_r < R:
        nch = -(-R // chunk_r)
        ids_p = doc_ids
        if nch * chunk_r > R:
            ids_p = jnp.pad(doc_ids, ((0, 0), (0, nch * chunk_r - R)),
                            constant_values=n_docs)
        chunks = jnp.moveaxis(ids_p.reshape(B, nch, chunk_r), 1, 0)
        out = jax.lax.map(
            lambda c: rescore_exact(index, c, top_c, top_v, sc,
                                    interpret=interpret),
            chunks,
        )
        return jnp.moveaxis(out, 0, 1).reshape(B, nch * chunk_r)[:, :R]
    safe = jnp.clip(doc_ids, 0, n_docs - 1)
    flat = safe.reshape(B * R)
    if getattr(index, "fwd_fused16", None) is not None:
        # half-width fused tile: (comp i16 << 16) | f16-bit value per i32
        # word (types.py to_device(fwd_f16=True)); arithmetic shift keeps
        # the -1 pad, pad value bits are +0.0 by construction
        packed = index.fwd_fused16[flat]  # i32 [B*R, W]
        comps = jax.lax.shift_right_arithmetic(packed, 16).astype(
            jnp.int16
        )
        vals = jax.lax.bitcast_convert_type(
            (packed & 0xFFFF).astype(jnp.uint16), jnp.float16
        ).astype(jnp.float32)
        vals = _decode_fwd_vals(index, vals, comps >= 0, flat)
    elif getattr(index, "fwd_fused", None) is not None:
        # one fused [B*R, 2W] gather instead of two: this stage is bound
        # by gathered-row count (~50 ns/row, byte width immaterial —
        # probe_r3b), so halving the row count halves the stage
        import jax

        fused = index.fwd_fused[flat]  # i32 [B*R, 2W]
        W2 = fused.shape[1] // 2
        comps = fused[:, :W2]
        vals = _decode_fwd_vals(
            index,
            jax.lax.bitcast_convert_type(fused[:, W2:], jnp.float32),
            comps, flat,
        )
    elif index.fwd_comps16 is not None:
        # int16 twin (PAD -> -1): halves the row-gather bytes, the
        # dominant cost of this stage; widened inside the kernel
        comps = index.fwd_comps16[flat]  # i16 [B*R, W]
        comps_mask_src = comps >= 0
    else:
        comps = index.fwd_comps[flat].astype(jnp.int32)  # [B*R, W]
        comps_mask_src = comps != PAD_COMPONENT
    if (getattr(index, "fwd_fused", None) is None
            and getattr(index, "fwd_fused16", None) is None):
        vals = _decode_fwd_vals(
            index, index.fwd_vals[flat], comps_mask_src, flat
        )  # f32 [B*R, W]
    W = comps.shape[1]
    Wp = -(-W // LANES) * LANES
    Rp = -(-R // 8) * 8
    padc = -1 if comps.dtype == jnp.int16 else PAD_COMPONENT
    if Wp > W:
        comps = jnp.pad(comps, ((0, 0), (0, Wp - W)),
                        constant_values=padc)
        vals = jnp.pad(vals, ((0, 0), (0, Wp - W)))
    comps = comps.reshape(B, R, Wp)
    vals = vals.reshape(B, R, Wp)
    if Rp > R:
        comps = jnp.pad(comps, ((0, 0), (0, Rp - R), (0, 0)),
                        constant_values=padc)
        vals = jnp.pad(vals, ((0, 0), (0, Rp - R), (0, 0)))
    SCP = -(-sc // 8) * 8
    qc = top_c[:, :sc].astype(jnp.int32)
    qv = top_v[:, :sc].astype(jnp.float32)
    if SCP > sc:
        qc = jnp.pad(qc, ((0, 0), (0, SCP - sc)),
                     constant_values=PAD_COMPONENT)
        qv = jnp.pad(qv, ((0, 0), (0, SCP - sc)))
    # SMEM budget: the scalar-prefetch arrays live in SMEM (scoped); cap
    # B*SCP per kernel call and chunk the batch (observed: 2048*64 s32+f32
    # = 1 MB overflows the scoped SMEM allocation on v5e)
    max_rows = max(1, 65536 // SCP)
    outs = []
    for s0 in range(0, B, max_rows):
        s1 = min(s0 + max_rows, B)
        outs.append(score_docs_rowmajor_pallas(
            comps[s0:s1], vals[s0:s1],
            qc[s0:s1].reshape((s1 - s0) * SCP),
            qv[s0:s1].reshape((s1 - s0) * SCP), sc,
            interpret=interpret,
        ))
    scores = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return scores[:, :R]
