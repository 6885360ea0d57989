"""FlatTermIndex — exact term-column brute-force search.

TPU-native counterpart of the reference's `FlatIndex`
(reference: vectorium FlatIndex via SeismicDataset.search,
src/inverted_index_wrapper.rs:721-742), redesigned for streaming hardware:
the collection is stored TRANSPOSED as a dense u8 matrix `[dim, n_docs]`
(one row per vocabulary term, per-document scale factors), and a query is
answered by streaming its <= Q term rows and accumulating
`sum_i qv_i * D[qc_i, :]` — contiguous reads + VPU FMAs, no scatter/gather
of document rows. Exact up to u8 quantization (~0.4% relative).

Memory is `dim * n_docs` bytes, so this is the small/medium-collection
engine (<= ~4x10^11 / dim docs per chip); the blocked inverted index is the
scalable path. It doubles as the fast ground-truth generator for recall
evaluation.
"""

from __future__ import annotations

import functools
import json
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.sparse import PAD_COMPONENT, CsrDataset

FLAT_SUFFIX = ".flat.seismic_tpu"


@dataclass
class FlatTermIndex:
    columns: np.ndarray  # uint8 [dim + 1, n_docs]; row `dim` is zeros
    doc_scale: np.ndarray  # f32 [n_docs]
    dim: int
    n_docs: int
    _device: object = None

    # ------------------------------------------------------------- build
    @staticmethod
    def build(dataset: CsrDataset) -> "FlatTermIndex":
        n, dim = len(dataset), dataset.dim
        lengths = dataset.row_lengths()
        docs = np.repeat(np.arange(n, dtype=np.int64), lengths)
        vals = dataset.values.astype(np.float32)
        # per-document max -> u8 scale
        mx = np.zeros(n, np.float32)
        np.maximum.at(mx, docs, vals)
        scale = np.where(mx > 0, mx / 255.0, 1.0).astype(np.float32)
        codes = np.clip(
            np.rint(vals / scale[docs]), 0, 255
        ).astype(np.uint8)
        cols = np.zeros((dim + 1, n), dtype=np.uint8)
        cols[dataset.components.astype(np.int64), docs] = codes
        return FlatTermIndex(
            columns=cols,
            doc_scale=np.where(mx > 0, scale, 0.0).astype(np.float32),
            dim=dim,
            n_docs=n,
        )

    # ------------------------------------------------------------ search
    def _dev(self):
        if self._device is None:
            self._device = (
                jnp.asarray(self.columns),
                jnp.asarray(self.doc_scale),
            )
        return self._device

    def search_batch(self, q_comps: np.ndarray, q_vals: np.ndarray, k: int):
        """Exact top-k; numpy in, numpy out. q_comps/q_vals are padded
        [B, Q] arrays (PAD_COMPONENT / 0)."""
        cols, dscale = self._dev()
        scores, ids = _flat_search_jit(
            cols,
            dscale,
            jnp.asarray(q_comps, jnp.int32),
            jnp.asarray(q_vals, jnp.float32),
            k,
            self.dim,
        )
        return np.asarray(scores), np.asarray(ids).astype(np.int64)

    # --------------------------------------------------------- save/load
    def save(self, path: str) -> str:
        if not path.endswith(FLAT_SUFFIX):
            path = path + FLAT_SUFFIX
        meta = {"dim": self.dim, "n_docs": self.n_docs}
        np.savez(
            path,
            columns=self.columns,
            doc_scale=self.doc_scale,
            __meta__=np.frombuffer(json.dumps(meta).encode(), np.uint8),
        )
        if os.path.exists(path + ".npz"):
            os.replace(path + ".npz", path)
        return path

    @staticmethod
    def load(path: str) -> "FlatTermIndex":
        if not path.endswith(FLAT_SUFFIX) and os.path.exists(
            path + FLAT_SUFFIX
        ):
            path = path + FLAT_SUFFIX
        with np.load(path) as z:
            meta = json.loads(bytes(z["__meta__"]).decode())
            return FlatTermIndex(
                columns=z["columns"],
                doc_scale=z["doc_scale"],
                dim=meta["dim"],
                n_docs=meta["n_docs"],
            )


@functools.partial(jax.jit, static_argnames=("k", "dim"))
def _flat_search_jit(cols, dscale, q_comps, q_vals, k: int, dim: int):
    B, Q = q_comps.shape
    n_docs = cols.shape[1]
    safe = jnp.minimum(q_comps, dim)  # PAD -> zero row
    qv = jnp.where(q_comps == PAD_COMPONENT, 0.0, q_vals)

    def step(acc, i):
        idx = jax.lax.dynamic_index_in_dim(safe, i, axis=1, keepdims=False)
        qvi = jax.lax.dynamic_index_in_dim(qv, i, axis=1, keepdims=True)
        rows = jnp.take(cols, idx, axis=0)  # [B, n_docs] u8
        return acc + qvi * rows.astype(jnp.float32), None

    acc, _ = jax.lax.scan(
        step, jnp.zeros((B, n_docs), jnp.float32), jnp.arange(Q)
    )
    scores = acc * dscale[None, :]
    top_scores, top_ids = jax.lax.top_k(scores, k)
    top_ids = jnp.where(top_scores > 0, top_ids, -1)
    top_scores = jnp.where(top_scores > 0, top_scores, -jnp.inf)
    return top_scores, top_ids
