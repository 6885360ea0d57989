"""Pallas TPU kernel: per-pair query projection onto list vocabularies.

Computes qloc[p, v] = sum_i qv[p, i] * [vocab[p, v] == qc[p, i]] for every
(query, list) pair — the projection of each query onto its selected list's
local vocabulary. Replaces the XLA compare-einsum (engine._qloc_compare),
which materializes the [B, QC, V, sc] one-hot tensor in HBM (~3 GB at the
bench shape, ~10-15 ms); here the compare-accumulate runs entirely in VMEM
registers (~740M compares, ~1-2 ms on the v5e VPU).

Operands are TRANSPOSED — pairs on the LANE axis, terms/vocab slots on the
sublane axis — because Mosaic only allows lane-dimension accesses at
128-aligned offsets: per-term rows `qcT[i:i+1, :]` are static sublane
slices that broadcast naturally against the [V, LANES] vocabulary block.

Reference parity: this is the batched equivalent of building the query
evaluator over a list's component universe (the reference evaluates
sparse-sparse dots term-by-term instead, posting_list.rs:188-215).
"""

from __future__ import annotations

LANES = 128  # pairs per grid step (lane axis width)


def project_qloc_pallas(
    vocabT,  # int32 OR int16 [V, P_cap] each pair's list vocabulary (transposed)
    qcT,  # int32 [SCP, P_cap] query term ids (PAD-padded)
    qvT,  # f32 [SCP, P_cap] query term values (0 at padding)
    sc: int,  # number of real term slots to scan (<= SCP)
    interpret: bool = False,
):
    """Returns qlocT f32 [V, P_cap]. An int16 vocab operand (PAD -> -1)
    halves the dominant HBM traffic of this stage (the [P, V] vocabulary
    gather + transpose); it is widened to int32 once per grid step so the
    compare loop stays in natively-supported int32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, P_cap = vocabT.shape
    SCP = qcT.shape[0]
    assert P_cap % LANES == 0 and V % 8 == 0 and SCP % 8 == 0
    assert sc <= SCP

    def kernel(vocab_ref, qc_ref, qv_ref, out_ref):
        vocab = vocab_ref[:].astype(jnp.int32)  # [V, LANES]
        acc = jnp.zeros((V, LANES), jnp.float32)
        for i in range(sc):  # static unroll: sublane slices are free
            c = qc_ref[i : i + 1, :]  # [1, LANES]
            v = qv_ref[i : i + 1, :]
            acc = acc + jnp.where(vocab == c, v, 0.0)
        out_ref[:] = acc

    grid = (P_cap // LANES,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((V, LANES), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SCP, LANES), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SCP, LANES), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((V, LANES), lambda p: (0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, P_cap), jnp.float32),
        interpret=interpret,
    )(vocabT, qcT, qvT)


ROWP = 32  # pairs per grid step of the row-major kernel (i8 out tiling)


def project_qloc_rowmajor(
    vocab,  # int16 OR int32 [P_cap, V] pair vocab rows (ROW-major)
    qc,  # int32 [P_cap, SCP] per-pair query term ids (PAD-padded)
    qv,  # f32 [P_cap, SCP] term values (0 at padding)
    sc: int,  # number of real term slots to scan (<= SCP)
    interpret: bool = False,
):
    """Row-major i8-quantizing projection: qloc[p, v] = sum_i qv[p, i] *
    [vocab[p, v] == qc[p, i]], consumed and produced in the layouts the
    neighbors already use — the [P, V] vocab gather output feeds straight
    in, and the [P, V] int8 output feeds the slot expansion directly.
    Eliminates the lane-major path's three materialized transposes
    (vocabT, qcT/qvT, and the [V, P] -> [P, V] int8 transpose), the
    round-2/3 qloc chain's dominant HBM traffic.

    The lane-major kernel needed terms on the sublane axis because lane
    slices must be 128-aligned; here each term is extracted from the
    [ROWP, SCP] block with an iota-compare reduction over lanes (~6% of
    the compare-loop cost), which makes the row-major broadcast scheme
    legal Mosaic.

    Returns (qloc_i8 int8 [P_cap, V], scale f32 [P_cap, 128]
    lane-replicated; true row = qloc_i8 * scale[:, :1])."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P_cap, V = vocab.shape
    SCP = qc.shape[1]
    assert P_cap % ROWP == 0 and V % 128 == 0 and SCP % 8 == 0
    assert sc <= SCP

    def kernel(vocab_ref, qc_ref, qv_ref, out_ref, scale_ref):
        vb = vocab_ref[:].astype(jnp.int32)  # [ROWP, V]
        qcb = qc_ref[:]  # [ROWP, SCP] int32
        qvb = qv_ref[:]  # [ROWP, SCP] f32
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWP, SCP), 1)
        acc = jnp.zeros((ROWP, V), jnp.float32)
        for i in range(sc):
            sel = lane == i
            c = jnp.sum(jnp.where(sel, qcb, 0), axis=1, keepdims=True)
            v = jnp.sum(jnp.where(sel, qvb, 0.0), axis=1, keepdims=True)
            acc = acc + jnp.where(vb == c, v, 0.0)
        amax = jnp.max(jnp.abs(acc), axis=1, keepdims=True)  # [ROWP, 1]
        scale = jnp.maximum(amax, 1e-20) / 127.0
        out_ref[:] = jnp.round(acc / scale).astype(jnp.int8)
        scale_ref[:] = jnp.broadcast_to(scale, (ROWP, 128))

    grid = (P_cap // ROWP,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWP, V), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWP, SCP), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWP, SCP), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWP, V), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWP, 128), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P_cap, V), jnp.int8),
            jax.ShapeDtypeStruct((P_cap, 128), jnp.float32),
        ],
        interpret=interpret,
    )(vocab, qc, qv)


def project_qloc_residue(
    vocabT,  # int16/int32 [V, P_cap] residue-R-ordered list vocabularies
    qcbT,  # int32 [R * SCB, P_cap] residue-bucketed term ids (-2 padded)
    qvbT,  # f32 [R * SCB, P_cap] term values (0 at padding)
    qcT,  # int32 [SCP, P_cap] plain term ids (for the spill rows)
    qvT,  # f32 [SCP, P_cap]
    R: int,  # residue groups (layout: ops.pallas_tiles.residue_layout)
    scb: int,  # bucket capacity (term slots per residue)
    scq: int,  # real term slots in qcT to scan for spill rows
    interpret: bool = False,
):
    """Residue-bucketed qloc projection: vocab slot group r is compared
    against ONLY the query terms with `term % R == r`, and the spill
    region (per-list residue-group overflow) against the full term list —
    ~3x fewer VPU compare ops at V=1024 than project_qloc_pallas's full
    scan (the round-2 qloc chain's dominant cost). Requires an index
    uploaded with to_device(vocab_residue=R) and per-query tables from
    grouped._residue_buckets. Returns qlocT f32 [V, P_cap].

    Terms dropped by bucket overflow (> scb terms of one residue; value-
    ordered, so only the smallest values drop) lose their tile-score
    contribution exactly like out-of-vocab terms — the exact rescore tail
    restores them for the returned top-k."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .pallas_tiles import residue_layout

    V, P_cap = vocabT.shape
    SCT = qcbT.shape[0]
    SCP = qcT.shape[0]
    assert SCT == R * scb, (SCT, R, scb)
    assert P_cap % LANES == 0 and scq <= SCP
    VRS, SPILL = residue_layout(V, R)
    assert VRS % 8 == 0 and SPILL % 8 == 0

    def kernel(vocab_ref, qcb_ref, qvb_ref, qc_ref, qv_ref, out_ref):
        for r in range(R):
            vb = vocab_ref[r * VRS:(r + 1) * VRS, :].astype(jnp.int32)
            acc = jnp.zeros((VRS, LANES), jnp.float32)
            for i in range(scb):
                j = r * scb + i
                c = qcb_ref[j:j + 1, :]
                v = qvb_ref[j:j + 1, :]
                acc = acc + jnp.where(vb == c, v, 0.0)
            out_ref[r * VRS:(r + 1) * VRS, :] = acc
        if SPILL:
            vs = vocab_ref[R * VRS:, :].astype(jnp.int32)
            acc = jnp.zeros((SPILL, LANES), jnp.float32)
            for i in range(scq):
                c = qc_ref[i:i + 1, :]
                v = qv_ref[i:i + 1, :]
                acc = acc + jnp.where(vs == c, v, 0.0)
            out_ref[R * VRS:, :] = acc

    grid = (P_cap // LANES,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((V, LANES), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SCT, LANES), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SCT, LANES), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SCP, LANES), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SCP, LANES), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((V, LANES), lambda p: (0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, P_cap), jnp.float32),
        interpret=interpret,
    )(vocabT, qcbT, qvbT, qcT, qvT)
