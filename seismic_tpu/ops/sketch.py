"""Signed CountSketch of sparse vectors.

This is a TPU-native addition with no reference equivalent: the reference
ranks posting blocks by sparse-merging the query against per-list quantized
summaries (reference: src/quantized_summary.rs:64-160), a pointer-chasing
pattern that maps poorly to the MXU. We instead project every block summary
(and optionally every document) into a fixed `sketch_dim`-wide dense space
with a deterministic signed hash; block ranking then becomes one dense
matmul per query batch. Dot products are preserved in expectation:
E[<sk(q), sk(x)>] = <q, x>, with collision noise O(|q||x|/sqrt(d_s)).

The exact CSR summary path (`summaries.py`) remains available for parity
tests; the sketch path is the speed mode.

The hash must be computable both on host (NumPy, at build time) and inside
jit (jnp, for query sketching), so both implementations live here and a test
pins them equal.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _splitmix32_np(x: np.ndarray, seed: int) -> np.ndarray:
    x = x.astype(np.uint32) + np.uint32((seed * 0x9E3779B9) & 0xFFFFFFFF)
    x = (x ^ (x >> np.uint32(16))) * np.uint32(0x85EBCA6B)
    x = (x ^ (x >> np.uint32(13))) * np.uint32(0xC2B2AE35)
    x = x ^ (x >> np.uint32(16))
    return x


def _splitmix32_jnp(x: jnp.ndarray, seed: int) -> jnp.ndarray:
    x = x.astype(jnp.uint32) + jnp.uint32((seed * 0x9E3779B9) & 0xFFFFFFFF)
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return x


def sketch_slots_np(components: np.ndarray, sketch_dim: int, seed: int):
    """(slot, sign) for each component id, NumPy version."""
    h = _splitmix32_np(np.asarray(components), seed)
    slot = (h % np.uint32(sketch_dim)).astype(np.int32)
    sign = np.where((h >> np.uint32(31)) & np.uint32(1), -1.0, 1.0).astype(
        np.float32
    )
    return slot, sign


def sketch_slots_jnp(components: jnp.ndarray, sketch_dim: int, seed: int):
    """(slot, sign) for each component id, traceable version."""
    h = _splitmix32_jnp(components, seed)
    slot = (h % jnp.uint32(sketch_dim)).astype(jnp.int32)
    sign = jnp.where((h >> jnp.uint32(31)) & jnp.uint32(1), -1.0, 1.0).astype(
        jnp.float32
    )
    return slot, sign


def sketch_csr_np(
    offsets: np.ndarray,
    components: np.ndarray,
    values: np.ndarray,
    sketch_dim: int,
    seed: int,
) -> np.ndarray:
    """Sketch every CSR row -> [n_rows, sketch_dim] float32 (build time)."""
    n = len(offsets) - 1
    slot, sign = sketch_slots_np(components, sketch_dim, seed)
    row = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    out = np.zeros((n, sketch_dim), dtype=np.float32)
    np.add.at(out, (row, slot.astype(np.int64)), sign * values.astype(np.float32))
    return out


def quantize_sketch_int8(sketches: np.ndarray):
    """Symmetric per-row int8 quantization -> (codes int8, scale f32[n])."""
    absmax = np.abs(sketches).max(axis=1)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    codes = np.clip(
        np.rint(sketches / scale[:, None]), -127, 127
    ).astype(np.int8)
    return codes, scale


def sketch_padded_queries(
    q_comps: jnp.ndarray,  # [B, Q] int32, padded with any id whose value is 0
    q_vals: jnp.ndarray,  # [B, Q] float32, 0 at padding
    sketch_dim: int,
    seed: int,
) -> jnp.ndarray:
    """Sketch a padded query batch inside jit -> [B, sketch_dim] float32.

    Uses a one-hot matmul so the scatter runs on the MXU.
    """
    slot, sign = sketch_slots_jnp(q_comps, sketch_dim, seed)
    onehot = _one_hot(slot, sketch_dim)
    weighted = sign * q_vals.astype(jnp.float32)
    return jnp.einsum(
        "bq,bqd->bd", weighted, onehot, preferred_element_type=jnp.float32
    )


def _one_hot(idx: jnp.ndarray, depth: int) -> jnp.ndarray:
    iota = jnp.arange(depth, dtype=jnp.int32)
    return (idx[..., None] == iota).astype(jnp.float32)
