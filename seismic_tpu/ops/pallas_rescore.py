"""Pallas TPU kernel: exact candidate re-scoring from forward-index rows.

For each candidate document (already gathered as a padded forward row of
component ids + decoded f32 values), computes the EXACT dot product with
the query:

    score[n] = sum_w vals[w, n] * sum_i qv[i, n] * [comps[w, n] == qc[i, n]]

via the same in-VMEM compare-accumulate as the qloc projection kernel
(ops/pallas_qloc.py) — operands transposed, candidates on the lane axis.

This one kernel serves three round-2 needs:
- final-pool exact re-rank (replaces the overflow-entry correction AND
  removes the u8 tile quantization error from the returned scores);
- TPU-fast k-NN refinement (reference Knn::refine,
  inverted_index.rs:551-593) — neighbor rows are wide-row gathers, which
  run at HBM speed on this device, then exact-scored here;
- the memory-parity mode: coarse tiles (small local vocab / int4) rank a
  pool, this kernel restores exact scores for the survivors.
"""

from __future__ import annotations

LANES = 128  # candidates per grid step


def score_docs_pallas(
    compsT,  # int32 [W, N_cap] candidate forward rows (PAD-padded)
    valsT,  # f32 [W, N_cap] decoded values (0 at padding)
    qcT,  # int32 [SCP, N_cap] query term ids per candidate
    qvT,  # f32 [SCP, N_cap] query term values (0 at padding)
    sc: int,  # number of real term slots to scan
    interpret: bool = False,
):
    """Returns exact scores f32 [N_cap]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W, N_cap = compsT.shape
    SCP = qcT.shape[0]
    assert N_cap % LANES == 0 and W % 8 == 0 and SCP % 8 == 0
    assert sc <= SCP

    def kernel(comps_ref, vals_ref, qc_ref, qv_ref, out_ref):
        comps = comps_ref[:]  # [W, LANES]
        qmatch = jnp.zeros((W, LANES), jnp.float32)
        for i in range(sc):  # static unroll; sublane slices are free
            c = qc_ref[i : i + 1, :]  # [1, LANES]
            v = qv_ref[i : i + 1, :]
            qmatch = qmatch + jnp.where(comps == c, v, 0.0)
        s = jnp.sum(vals_ref[:] * qmatch, axis=0, keepdims=True)  # [1, L]
        out_ref[:] = jnp.broadcast_to(s, (8, LANES))

    grid = (N_cap // LANES,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, LANES), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, LANES), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SCP, LANES), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SCP, LANES), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N_cap), jnp.float32),
        interpret=interpret,
    )(compsT, valsT, qcT, qvT)
    return out[0]


def rescore_exact(index, doc_ids, top_c, top_v, sc: int,
                  interpret: bool = False):
    """Exact scores of `doc_ids` [B, R] against each row's query terms
    (top_c/top_v [B, sc]). Gathers forward rows (wide-row gather: HBM
    speed), decodes values, and runs the compare kernel. Returns f32
    [B, R]."""
    import jax.numpy as jnp

    from ..data.sparse import PAD_COMPONENT
    from ..search.engine import _decode_fwd_vals

    B, R = doc_ids.shape
    n_docs = index.n_docs
    safe = jnp.clip(doc_ids, 0, n_docs - 1)
    flat = safe.reshape(B * R)
    comps = index.fwd_comps[flat].astype(jnp.int32)  # [B*R, W]
    vals = _decode_fwd_vals(
        index, index.fwd_vals[flat], comps, flat
    )  # f32 [B*R, W]
    W = comps.shape[1]
    Wp = -(-W // 8) * 8
    N = B * R
    N_cap = -(-N // LANES) * LANES
    compsT = comps.T
    valsT = vals.T
    qcT = jnp.broadcast_to(
        top_c[:, None, :sc], (B, R, sc)
    ).reshape(N, sc).T
    qvT = jnp.broadcast_to(
        top_v[:, None, :sc], (B, R, sc)
    ).reshape(N, sc).T
    SCP = -(-sc // 8) * 8
    if Wp > W:
        compsT = jnp.pad(compsT, ((0, Wp - W), (0, 0)),
                         constant_values=PAD_COMPONENT)
        valsT = jnp.pad(valsT, ((0, Wp - W), (0, 0)))
    if SCP > sc:
        qcT = jnp.pad(qcT, ((0, SCP - sc), (0, 0)),
                      constant_values=PAD_COMPONENT)
        qvT = jnp.pad(qvT, ((0, SCP - sc), (0, 0)))
    if N_cap > N:
        compsT = jnp.pad(compsT, ((0, 0), (0, N_cap - N)),
                         constant_values=PAD_COMPONENT)
        valsT = jnp.pad(valsT, ((0, 0), (0, N_cap - N)))
        qcT = jnp.pad(qcT, ((0, 0), (0, N_cap - N)),
                      constant_values=PAD_COMPONENT)
        qvT = jnp.pad(qvT, ((0, 0), (0, N_cap - N)))
    scores = score_docs_pallas(compsT, valsT, qcT, qvT, sc,
                               interpret=interpret)
    return scores[:N].reshape(B, R)
