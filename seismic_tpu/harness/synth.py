"""Synthetic SPLADE-like sparse collections for benchmarks and tests.

The environment has no network access, so MS MARCO itself is unavailable;
benchmarks run on synthetic collections shaped like SPLADE-v3 output on
MS MARCO passages (SURVEY.md §6): vocab ~30522, Zipfian component
popularity, ~120-190 nonzeros per document, ~15-60 per query, positive
gamma-distributed impact scores. Deterministic given the seed.
"""

from __future__ import annotations

import numpy as np

from ..data.sparse import CsrDataset

MSMARCO_VOCAB = 30522


def _zipf_probs(dim: int, alpha: float, rng: np.random.Generator):
    """Zipf-ish component popularity with a shuffled rank->id map so popular
    components are spread over the id space (like a real wordpiece vocab)."""
    ranks = np.arange(1, dim + 1, dtype=np.float64)
    p = ranks ** (-alpha)
    p /= p.sum()
    perm = rng.permutation(dim)
    return p[np.argsort(perm)]  # probability per component id


def synth_dataset(
    n_docs: int,
    dim: int = MSMARCO_VOCAB,
    mean_nnz: float = 150.0,
    std_nnz: float = 30.0,
    min_nnz: int = 16,
    max_nnz: int = 256,
    alpha: float = 0.85,
    seed: int = 0,
) -> CsrDataset:
    rng = np.random.default_rng(seed)
    probs = _zipf_probs(dim, alpha, rng)
    lengths = np.clip(
        rng.normal(mean_nnz, std_nnz, size=n_docs).astype(np.int64),
        min_nnz,
        max_nnz,
    )
    total = int(lengths.sum())
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    # sample components with replacement then dedupe per row (cheap and
    # close enough to without-replacement at these lengths)
    comps = rng.choice(dim, size=total, p=probs).astype(np.int32)
    vals = (rng.gamma(2.0, 0.7, size=total) + 0.05).astype(np.float32)
    # sort within each row and drop duplicates
    row = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    order = np.lexsort((comps, row))
    comps, vals, row = comps[order], vals[order], row[order]
    keep = np.ones(total, dtype=bool)
    keep[1:] = (comps[1:] != comps[:-1]) | (row[1:] != row[:-1])
    comps, vals, row = comps[keep], vals[keep], row[keep]
    new_lengths = np.bincount(row, minlength=n_docs)
    new_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(new_lengths, out=new_offsets[1:])
    return CsrDataset(new_offsets, comps, vals, dim)


def synth_queries(
    n_queries: int,
    dim: int = MSMARCO_VOCAB,
    mean_nnz: float = 40.0,
    std_nnz: float = 12.0,
    min_nnz: int = 5,
    max_nnz: int = 64,
    alpha: float = 0.85,
    seed: int = 1,
):
    ds = synth_dataset(
        n_queries,
        dim=dim,
        mean_nnz=mean_nnz,
        std_nnz=std_nnz,
        min_nnz=min_nnz,
        max_nnz=max_nnz,
        alpha=alpha,
        seed=seed,
    )
    comps = [ds.get(i)[0] for i in range(n_queries)]
    vals = [ds.get(i)[1] for i in range(n_queries)]
    return comps, vals
