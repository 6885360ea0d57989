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


@functools.partial(jax.jit, static_argnames=("k",))
def _merge_topk(run_s, run_i, chunk_s, start, n_valid, k: int):
    """Merge a chunk's scores into the running per-query top-k with the
    same (score desc, id asc) tie-breaking as the full argsort path."""
    B, C = chunk_s.shape
    ids = start + jnp.arange(C, dtype=jnp.int64)
    valid = jnp.arange(C, dtype=jnp.int32) < n_valid
    chunk_s = jnp.where(valid[None, :], chunk_s, -jnp.inf)
    cs, ci_local = jax.lax.top_k(chunk_s, min(k, C))
    ci = jnp.take(ids, ci_local)
    s_cat = jnp.concatenate([run_s, cs], axis=1)
    i_cat = jnp.concatenate([run_i, ci], axis=1)
    # ascending (neg score, id): score desc with smaller-id tie-break
    neg = jnp.where(jnp.isfinite(s_cat), -s_cat, jnp.inf)
    neg_s, i_s = jax.lax.sort((neg, i_cat), dimension=1, num_keys=2)
    return -neg_s[:, :k], i_s[:, :k]


def exact_search(
    dataset: CsrDataset,
    q_comps: np.ndarray,
    q_vals: np.ndarray,
    k: int,
    chunk: int = 4096,
    stream: bool | None = None,
):
    """Exact top-k by dot product. Returns (scores [B,k], doc_ids [B,k]).

    Ties are broken by the smaller document id, which also makes the result
    deterministic across chip counts (SURVEY.md §5 distributed note).

    With `stream` (auto-enabled when the full [B, n_docs] score matrix
    would exceed ~4 GB — e.g. ground truth at the 8.8M-doc rung) the
    per-chunk scores are merged into a running device-resident top-k
    instead of materializing all scores on the host; results are
    identical (the merge reproduces the argsort tie-breaking).
    """
    dim = dataset.dim
    B = q_comps.shape[0]
    q_dense = jnp.asarray(densify_queries(q_comps, q_vals, dim))
    n = len(dataset)
    if stream is None:
        stream = B * n * 4 > 4e9
    if stream:
        return _exact_search_stream(dataset, q_dense, B, n, k, chunk)
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


def _exact_search_stream(dataset, q_dense, B: int, n: int, k: int,
                         chunk: int):
    """Chunked exact search with a device-resident running top-k."""
    k_eff = min(k, n)
    lengths = dataset.row_lengths()
    row_of_entry = np.repeat(np.arange(n, dtype=np.int64), lengths)
    run_s = jnp.full((B, k_eff), -jnp.inf, jnp.float32)
    run_i = jnp.full((B, k_eff), n, jnp.int64)
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        s, e = int(dataset.offsets[start]), int(dataset.offsets[end])
        flat_rows = (row_of_entry[s:e] - start).astype(np.int32)
        flat_comps = dataset.components[s:e].astype(np.int32)
        flat_vals = dataset.values[s:e].astype(np.float32)
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
            dim=dataset.dim,
            chunk=chunk,
        )
        run_s, run_i = _merge_topk(
            run_s, run_i, scores, jnp.int64(start),
            jnp.int32(end - start), k_eff,
        )
    top_scores = np.asarray(run_s)
    idx = np.asarray(run_i)
    idx = np.where(np.isfinite(top_scores), idx, -1)
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
