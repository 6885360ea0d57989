"""Build-pipeline unit tests (pruning, k-means blocking, summarization,
quantization) against hand-rolled oracles."""

import numpy as np
import pytest

from seismic_tpu.build.kmeans import kmeans_blocking
from seismic_tpu.build.pruning import (
    coi_pruning,
    fixed_pruning,
    global_threshold_pruning,
)
from seismic_tpu.build.summaries import (
    block_summaries,
    dequantize_u8,
    quantize_u8,
)
from seismic_tpu.config import (
    EnergyPreservingSummarization,
    FixedSizeSummarization,
    RandomKmeans,
    RandomKmeansInvertedIndex,
    RandomKmeansInvertedIndexApprox,
)
from seismic_tpu.data.sparse import CsrDataset
from tests.conftest import make_random_dataset


# ---------------------------------------------------------------- pruning


def test_fixed_pruning_keeps_topk_per_list(rng):
    ds = make_random_dataset(rng, n_docs=100, dim=50, seed=1)
    table = fixed_pruning(ds, n_postings=5)
    dense = ds.to_dense()
    for lst in range(50):
        docs, vals = table.list_slice(lst)
        col = dense[:, lst]
        expected = set(np.argsort(-col, kind="stable")[: min(5, (col > 0).sum())])
        assert len(docs) <= 5
        assert set(docs.tolist()) <= expected | {
            d for d in range(100) if col[d] > 0
        }
        # exactly the top-|docs| by value
        got_vals = sorted(vals.tolist(), reverse=True)
        exp_vals = sorted(col[col > 0].tolist(), reverse=True)[: len(docs)]
        assert np.allclose(got_vals, exp_vals)


def test_global_threshold_pruning_totals(rng):
    ds = make_random_dataset(rng, n_docs=80, dim=40, seed=2)
    n_postings = 10
    table = global_threshold_pruning(ds, n_postings, max_fraction=1.5)
    total = table.offsets[-1]
    assert total <= 40 * n_postings
    # per-list cap honored
    assert (table.list_lengths() <= int(n_postings * 1.5)).all()
    # the kept entries are globally the largest (up to per-list capping)
    all_vals = np.sort(ds.values.astype(np.float32))[::-1]
    kept_vals = np.sort(table.values)[::-1]
    assert kept_vals[0] == all_vals[0]


def test_coi_pruning_fraction(rng):
    ds = make_random_dataset(rng, n_docs=60, dim=30, max_nnz=20, seed=3)
    table = coi_pruning(ds, alpha=0.5, max_n_postings=100)
    dense = ds.to_dense()
    for lst in range(30):
        docs, _ = table.list_slice(lst)
        full = int((dense[:, lst] > 0).sum())
        if full:
            assert len(docs) == min(100, int(full * 0.5) + 1)


# ---------------------------------------------------------------- k-means


@pytest.mark.parametrize(
    "algo",
    [
        RandomKmeansInvertedIndexApprox(doc_cut=10),
        RandomKmeansInvertedIndex(pruning_factor=0.5, doc_cut=10),
        RandomKmeans(),
    ],
)
def test_kmeans_partitions_docs(rng, algo):
    ds = make_random_dataset(rng, n_docs=120, dim=80, seed=4)
    doc_ids = np.arange(0, 120, 2, dtype=np.int64)  # 60 docs
    ordered, offsets = kmeans_blocking(
        ds, doc_ids, centroid_fraction=0.2, min_cluster_size=2,
        algorithm=algo, seed=99, list_id=7,
    )
    # a permutation of the input
    assert sorted(ordered.tolist()) == sorted(doc_ids.tolist())
    assert offsets[0] == 0 and offsets[-1] == len(doc_ids)
    assert np.all(np.diff(offsets) > 0)
    # deterministic
    ordered2, offsets2 = kmeans_blocking(
        ds, doc_ids, centroid_fraction=0.2, min_cluster_size=2,
        algorithm=algo, seed=99, list_id=7,
    )
    assert np.array_equal(ordered, ordered2)
    assert np.array_equal(offsets, offsets2)


def test_kmeans_min_cluster_dissolution(rng):
    ds = make_random_dataset(rng, n_docs=40, dim=60, seed=5)
    doc_ids = np.arange(40, dtype=np.int64)
    _, offsets = kmeans_blocking(
        ds, doc_ids, centroid_fraction=0.5, min_cluster_size=3,
        algorithm=RandomKmeansInvertedIndexApprox(doc_cut=10),
        seed=1, list_id=0,
    )
    sizes = np.diff(offsets)
    # after dissolution + reassignment no *original* cluster of size <= 3
    # survives unless everything collapsed; sizes can only grow via merging
    assert sizes.sum() == 40


# ------------------------------------------------------------- summaries


def test_quantize_u8_roundtrip():
    vals = np.asarray([0.1, 0.5, 2.0, 0.1], np.float32)
    mn, quant, codes = quantize_u8(vals)
    back = dequantize_u8(codes, mn, quant)
    assert np.abs(back - vals).max() <= quant / 2 + 1e-6
    # degenerate all-equal
    mn, quant, codes = quantize_u8(np.asarray([0.7, 0.7], np.float32))
    assert quant == 0.0 and np.all(codes == 0)
    assert np.allclose(dequantize_u8(codes, mn, quant), 0.7)


def _summary_oracle(ds, block, energy=None, n_components=None):
    """Independent max-pool + selection oracle."""
    pooled = {}
    for d in block:
        c, v = ds.get(d)
        for ci, vi in zip(c, v):
            pooled[int(ci)] = max(pooled.get(int(ci), 0.0), float(vi))
    items = sorted(pooled.items(), key=lambda kv: -kv[1])
    if n_components is not None:
        kept = items[:n_components]
    else:
        total = sum(v for _, v in items)
        until = total * energy
        acc, kept = 0.0, []
        for c, v in items:
            if acc >= until:
                break
            kept.append((c, v))
            acc += v
    return dict(kept)


def test_energy_preserving_summary_oracle(rng):
    ds = make_random_dataset(rng, n_docs=30, dim=100, seed=6)
    ordered = np.arange(30, dtype=np.int64)
    offsets = np.asarray([0, 10, 22, 30], np.int64)
    out = block_summaries(
        ds, ordered, offsets, EnergyPreservingSummarization(0.4), 128
    )
    assert len(out) == 3
    for blk in range(3):
        block = ordered[offsets[blk] : offsets[blk + 1]]
        oracle = _summary_oracle(ds, block, energy=0.4)
        cc, codes, mn, quant = out[blk]
        assert set(cc.tolist()) == set(oracle.keys())
        assert np.all(np.diff(cc) > 0)  # sorted by component
        back = dequantize_u8(codes, mn, quant)
        for c, v in zip(cc, back):
            assert abs(oracle[int(c)] - v) <= quant / 2 + 1e-5


def test_fixed_size_summary_oracle(rng):
    ds = make_random_dataset(rng, n_docs=20, dim=80, seed=8)
    ordered = np.arange(20, dtype=np.int64)
    offsets = np.asarray([0, 20], np.int64)
    out = block_summaries(
        ds, ordered, offsets, FixedSizeSummarization(n_components=10), 128
    )
    oracle = _summary_oracle(ds, ordered, n_components=10)
    cc, codes, mn, quant = out[0]
    assert len(cc) == 10
    assert set(cc.tolist()) == set(oracle.keys())


def test_summary_nnz_cap(rng):
    ds = make_random_dataset(rng, n_docs=50, dim=300, min_nnz=30,
                             max_nnz=40, seed=9)
    ordered = np.arange(50, dtype=np.int64)
    offsets = np.asarray([0, 50], np.int64)
    out = block_summaries(
        ds, ordered, offsets, EnergyPreservingSummarization(1.1), 64
    )
    assert len(out[0][0]) <= 64


def test_builder_block_structure(rng):
    from seismic_tpu.build.builder import build_index
    from seismic_tpu.config import Configuration, TpuLayout

    ds = make_random_dataset(rng, n_docs=150, dim=200, seed=10)
    cfg = Configuration(layout=TpuLayout(max_block_len=8))
    arrays = build_index(ds, cfg)
    # blocks respect the cap
    assert arrays.block_len.max() <= 8
    # every posting list's docs are unique and present in the dataset
    for lst in (0, 5, 50):
        s = int(arrays.list_block_start[lst])
        n = int(arrays.list_n_blocks[lst])
        docs = []
        for b in range(s, s + n):
            st, ln = int(arrays.block_start[b]), int(arrays.block_len[b])
            docs.extend(arrays.postings[st : st + ln].tolist())
        assert len(docs) == len(set(docs))
        assert all(0 <= d < 150 for d in docs)
    # dense summaries exist and are scaled
    assert arrays.dense_summary is not None
    assert arrays.dense_summary.shape[0] == arrays.block_start.shape[0]


def test_value_dtype_u16_roundtrip():
    """fixedu16 value type (reference: build_inverted_index.rs:58-66):
    per-doc scalar quantization at 16-bit resolution; decoded scores
    must track f32 within quantization tolerance."""
    import numpy as np
    from seismic_tpu.build.builder import _encode_values
    from seismic_tpu.data.sparse import PAD_COMPONENT

    rng = np.random.default_rng(3)
    n, w = 32, 24
    comps = rng.integers(0, 500, (n, w)).astype(np.int32)
    comps[:, -4:] = PAD_COMPONENT
    vals = (rng.random((n, w)) * 3.0).astype(np.float32)
    # a degenerate all-equal row and an empty row
    vals[5, :] = 1.25
    comps[6, :] = PAD_COMPONENT
    codes, mins, steps = _encode_values(vals, comps, "u16")
    assert codes.dtype == np.uint16
    dec = codes.astype(np.float32) * steps[:, None] + mins[:, None]
    mask = comps != PAD_COMPONENT
    err = np.abs(np.where(mask, dec - vals, 0.0))
    assert err.max() < 3.0 / 65535.0 * 0.51 + 1e-6
    # degenerate row decodes to the constant
    assert np.allclose(dec[5][mask[5]], 1.25)
    # u8 path still matches the reference quantizer
    codes8, mins8, steps8 = _encode_values(vals, comps, "u8")
    from seismic_tpu.build.summaries import quantize_u8
    for i in range(n):
        mn, q, c = quantize_u8(vals[i][mask[i]])
        assert np.isclose(mins8[i], mn)
        assert np.isclose(steps8[i], q)
        assert (codes8[i][mask[i]] == c).all()


def test_convert_index_dtypes(rng):
    """Built-index forward-value conversion (reference ConvertFrom,
    inverted_index.rs:237-284): posting structures shared, forward values
    re-encoded, chained conversions accumulate only one quantization."""
    import dataclasses

    from seismic_tpu.build.builder import build_index
    from seismic_tpu.build.convert import (
        convert_index,
        decode_forward_values,
    )
    from seismic_tpu.config import Configuration, TpuLayout
    from tests.conftest import make_random_dataset

    ds = make_random_dataset(rng, n_docs=200, dim=300, min_nnz=8,
                             max_nnz=25, seed=3)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=128))
    base = build_index(ds, cfg, value_dtype="f32")
    f32 = decode_forward_values(base)

    for dt, tol in (("f16", 1e-3), ("bf16", 8e-3), ("u16", 1e-4),
                    ("u8", 6e-3), ("fixedu8", 6e-3)):
        conv = convert_index(base, dt)
        # shared (identical objects) posting structures
        assert conv.postings is base.postings
        assert conv.doc_tiles is base.doc_tiles
        assert conv.fwd_comps is base.fwd_comps
        back = decode_forward_values(conv)
        err = np.abs(back - f32)
        assert float(err.max()) <= tol * max(1.0, float(np.abs(f32).max())), dt
        if dt.endswith("u8"):
            assert conv.fwd_vals.dtype == np.uint8
            assert conv.fwd_val_min is not None

    # u8 -> f32 -> u8 round trip: second pass adds no further error
    u8 = convert_index(base, "u8")
    u8b = convert_index(convert_index(u8, "f32"), "u8")
    assert np.allclose(decode_forward_values(u8), decode_forward_values(u8b),
                       atol=1e-6)

    # direct u8 build == f32 build + convert (the reference's fixedu8 CLI
    # equivalence, build_inverted_index.rs:278-286)
    direct = build_index(ds, cfg, value_dtype="u8")
    assert (direct.fwd_vals == u8.fwd_vals).all()
    assert np.allclose(direct.fwd_val_min, u8.fwd_val_min)

    with np.testing.assert_raises(ValueError):
        convert_index(base, "i4")


def test_api_convert_roundtrip(rng):
    """API-level convert(): search results survive a u8 conversion."""
    from seismic_tpu.api import SeismicIndexRaw
    from tests.conftest import make_random_dataset, make_random_queries

    ds = make_random_dataset(rng, n_docs=200, dim=300, min_nnz=8,
                             max_nnz=25, seed=5)
    idx = SeismicIndexRaw.build_from_csr(ds)
    qc, qv = make_random_queries(np.random.default_rng(4), n_queries=4,
                                 dim=300, min_nnz=5, max_nnz=15)
    r0 = idx.batch_search(qc, qv, k=5, query_cut=10, heap_factor=0.0)
    out = idx.convert("u8")
    assert out is idx
    assert idx.arrays.fwd_vals.dtype == np.uint8
    r1 = idx.batch_search(qc, qv, k=5, query_cut=10, heap_factor=0.0)
    agree = 0
    for a, b in zip(r0, r1):
        agree += len({t[1] for t in a} & {t[1] for t in b})
    assert agree >= 0.8 * sum(len(a) for a in r0)
