"""Exact (brute-force) maximum-inner-product search.

TPU-native replacement for the reference's `FlatIndex`
(reference: src/inverted_index_wrapper.rs:721-742), used to compute ground
truth for recall evaluation. The whole collection is scored with dense f32
matmuls on the MXU, chunked over documents so arbitrarily large collections
fit: each CSR chunk is scattered to a dense [chunk, dim] tile inside jit and
multiplied against the densified query batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..data.sparse import CsrDataset


def densify_queries(
    q_comps: np.ndarray, q_vals: np.ndarray, dim: int
) -> np.ndarray:
    """Padded query batch [B, Q] -> dense [B, dim] float32 (host)."""
    B = q_comps.shape[0]
    out = np.zeros((B, dim), dtype=np.float32)
    valid = (q_comps >= 0) & (q_comps < dim)
    rows = np.broadcast_to(np.arange(B)[:, None], q_comps.shape)[valid]
    out[rows, q_comps[valid]] = q_vals[valid]
    return out


@functools.partial(jax.jit, static_argnames=("dim", "chunk"))
def _score_chunk(flat_rows, flat_comps, flat_vals, q_dense, dim: int, chunk: int):
    """Scatter one CSR chunk to dense [chunk, dim] and matmul with queries."""
    dense = jnp.zeros((chunk, dim), dtype=jnp.float32)
    dense = dense.at[flat_rows, flat_comps].add(flat_vals)
    return jnp.dot(q_dense, dense.T, preferred_element_type=jnp.float32)


def exact_search(
    dataset: CsrDataset,
    q_comps: np.ndarray,
    q_vals: np.ndarray,
    k: int,
    chunk: int = 4096,
):
    """Exact top-k by dot product. Returns (scores [B,k], doc_ids [B,k]).

    Ties are broken by the smaller document id, which also makes the result
    deterministic across chip counts (SURVEY.md §5 distributed note).
    """
    dim = dataset.dim
    B = q_comps.shape[0]
    q_dense = jnp.asarray(densify_queries(q_comps, q_vals, dim))
    n = len(dataset)
    all_scores = np.zeros((B, n), dtype=np.float32)
    lengths = dataset.row_lengths()
    row_of_entry = np.repeat(np.arange(n, dtype=np.int64), lengths)
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        s, e = int(dataset.offsets[start]), int(dataset.offsets[end])
        flat_rows = (row_of_entry[s:e] - start).astype(np.int32)
        flat_comps = dataset.components[s:e].astype(np.int32)
        flat_vals = dataset.values[s:e].astype(np.float32)
        # Pad the entry arrays so jit sees a bounded set of shapes.
        cap = _entry_cap(e - s)
        pad = cap - (e - s)
        if pad:
            flat_rows = np.pad(flat_rows, (0, pad), constant_values=0)
            flat_comps = np.pad(flat_comps, (0, pad), constant_values=0)
            flat_vals = np.pad(flat_vals, (0, pad), constant_values=0.0)
        scores = _score_chunk(
            jnp.asarray(flat_rows),
            jnp.asarray(flat_comps),
            jnp.asarray(flat_vals),
            q_dense,
            dim=dim,
            chunk=chunk,
        )
        all_scores[:, start:end] = np.asarray(scores)[:, : end - start]

    k_eff = min(k, n)
    # Stable top-k with (score desc, id asc) tie-breaking.
    idx = np.argsort(-all_scores, axis=1, kind="stable")[:, :k_eff]
    top_scores = np.take_along_axis(all_scores, idx, axis=1)
    if k_eff < k:
        idx = np.pad(idx, ((0, 0), (0, k - k_eff)), constant_values=-1)
        top_scores = np.pad(
            top_scores, ((0, 0), (0, k - k_eff)), constant_values=-np.inf
        )
    return top_scores, idx.astype(np.int64)


def _entry_cap(n_entries: int) -> int:
    """Round entry counts to powers of two to bound jit recompilation."""
    cap = 1024
    while cap < n_entries:
        cap *= 2
    return cap


def exact_search_numpy(
    dataset: CsrDataset, q_comps: np.ndarray, q_vals: np.ndarray, k: int
):
    """Pure-NumPy oracle used by unit tests (independent of JAX)."""
    dim = dataset.dim
    q_dense = densify_queries(q_comps, q_vals, dim)
    n = len(dataset)
    scores = np.zeros((q_comps.shape[0], n), dtype=np.float32)
    for d in range(n):
        comps, vals = dataset.get(d)
        scores[:, d] = q_dense[:, comps] @ vals.astype(np.float32)
    k_eff = min(k, n)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k_eff]
    top = np.take_along_axis(scores, idx, axis=1)
    return top, idx.astype(np.int64)
