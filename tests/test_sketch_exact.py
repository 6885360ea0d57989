"""CountSketch and exact-search unit tests."""

import jax.numpy as jnp
import numpy as np

from seismic_tpu.data.sparse import PAD_COMPONENT
from seismic_tpu.ops.sketch import (
    quantize_sketch_int8,
    sketch_csr_np,
    sketch_padded_queries,
    sketch_slots_jnp,
    sketch_slots_np,
)
from seismic_tpu.search.exact import exact_search, exact_search_numpy
from tests.conftest import make_random_dataset, make_random_queries


def test_hash_np_jnp_agree():
    comps = np.arange(0, 100000, 37, dtype=np.int64)
    slot_np, sign_np = sketch_slots_np(comps, 128, 42)
    slot_j, sign_j = sketch_slots_jnp(jnp.asarray(comps), 128, 42)
    assert np.array_equal(slot_np, np.asarray(slot_j))
    assert np.array_equal(sign_np, np.asarray(sign_j))


def test_sketch_preserves_dots(rng):
    ds = make_random_dataset(rng, n_docs=100, dim=2000, min_nnz=20,
                             max_nnz=60, seed=5)
    sk = sketch_csr_np(ds.offsets, ds.components, ds.values, 256, 42)
    dense = ds.to_dense()
    exact = dense @ dense.T
    approx = sk @ sk.T
    # collision noise is O(|x||y|/sqrt(d_s)); check against that scale
    norms = np.linalg.norm(dense, axis=1)
    bound = norms[:, None] * norms[None, :] / np.sqrt(256)
    assert (np.abs(approx - exact) < 4 * bound).mean() > 0.98
    diag_rel = np.abs(np.diag(approx) - np.diag(exact)) / np.diag(exact)
    assert diag_rel.mean() < 0.25


def test_query_sketch_matches_csr_sketch(rng):
    ds = make_random_dataset(rng, n_docs=8, dim=1000, seed=9)
    sk_ref = sketch_csr_np(ds.offsets, ds.components, ds.values, 128, 42)
    comps, vals = ds.padded_tiles(64)
    sk = sketch_padded_queries(
        jnp.asarray(comps), jnp.asarray(vals), 128, 42
    )
    assert np.allclose(np.asarray(sk), sk_ref, atol=1e-4)


def test_quantize_sketch_int8(rng):
    x = rng.normal(size=(10, 64)).astype(np.float32)
    codes, scale = quantize_sketch_int8(x)
    back = codes.astype(np.float32) * scale[:, None]
    assert np.abs(back - x).max() < np.abs(x).max() / 100


def test_exact_search_matches_numpy_oracle(rng):
    ds = make_random_dataset(rng, n_docs=300, dim=700, seed=21)
    qc, qv = make_random_queries(rng, n_queries=12, dim=700)
    from seismic_tpu.search.engine import pad_queries

    q_comps, q_vals = pad_queries(qc, qv, 64)
    s1, i1 = exact_search(ds, q_comps, q_vals, k=10, chunk=128)
    s2, i2 = exact_search_numpy(ds, q_comps, q_vals, k=10)
    assert np.allclose(s1, s2, atol=1e-3)
    assert np.array_equal(i1, i2)


def test_exact_search_k_exceeds_n(rng):
    ds = make_random_dataset(rng, n_docs=5, dim=50, seed=2)
    qc, qv = make_random_queries(rng, n_queries=2, dim=50, min_nnz=3, max_nnz=5)
    from seismic_tpu.search.engine import pad_queries

    q_comps, q_vals = pad_queries(qc, qv, 16)
    s, i = exact_search(ds, q_comps, q_vals, k=8)
    assert s.shape == (2, 8)
    assert np.all(i[:, 5:] == -1)


def test_exact_search_stream_matches(rng):
    """The streaming (running device top-k) path must reproduce the
    materialized path exactly, including (score desc, id asc) ties."""
    ds = make_random_dataset(rng, n_docs=300, dim=700, seed=23)
    qc, qv = make_random_queries(rng, n_queries=12, dim=700)
    from seismic_tpu.search.engine import pad_queries

    q_comps, q_vals = pad_queries(qc, qv, 64)
    s1, i1 = exact_search(ds, q_comps, q_vals, k=10, chunk=128,
                          stream=False)
    s2, i2 = exact_search(ds, q_comps, q_vals, k=10, chunk=128,
                          stream=True)
    assert np.allclose(s1, s2, atol=1e-3)
    assert np.array_equal(i1, i2)
    # k > n_docs padding contract holds on the stream path too
    ds5 = make_random_dataset(rng, n_docs=5, dim=50, seed=2)
    qc5, qv5 = make_random_queries(rng, n_queries=2, dim=50, min_nnz=3,
                                   max_nnz=5)
    q_comps5, q_vals5 = pad_queries(qc5, qv5, 16)
    s, i = exact_search(ds5, q_comps5, q_vals5, k=8, stream=True)
    assert s.shape == (2, 8)
    assert np.all(i[:, 5:] == -1)
