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
