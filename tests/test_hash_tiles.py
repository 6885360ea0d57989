"""Hashed doc tiles (ops/pallas_tiles.py::hash_retile): tile contents vs
a bincount oracle, and end-to-end grouped-path recall parity with the
truncated-vocab tiles (hashed pool scores are upper bounds — candidate
recall must not degrade)."""

import dataclasses

import numpy as np
import pytest

from seismic_tpu import Configuration, TpuLayout
from seismic_tpu.build.builder import build_index
from seismic_tpu.data.sparse import PAD_COMPONENT
from seismic_tpu.ops.pallas_tiles import hash_retile
from seismic_tpu.search.engine import pad_queries
from seismic_tpu.search.exact import exact_search_numpy
from seismic_tpu.search.grouped import GroupedParams, search_grouped
from seismic_tpu.search.planner import PlannerContext
from tests.conftest import make_random_dataset, make_random_queries


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    ds = make_random_dataset(rng, n_docs=400, dim=600, min_nnz=15,
                             max_nnz=50, seed=47)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256))
    arrays = build_index(ds, cfg)
    qc, qv = make_random_queries(np.random.default_rng(3), n_queries=16,
                                 dim=600, min_nnz=8, max_nnz=30)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    _, gt_i = exact_search_numpy(ds, q_comps, q_vals, k=10)
    return ds, arrays, q_comps, q_vals, gt_i


def _recall(ids, gt_ids, k=10):
    hits = tot = 0
    for row, gt in zip(ids, gt_ids):
        r = {int(d) for d in row[:k] if d >= 0}
        g = {int(d) for d in gt[:k] if d >= 0}
        hits += len(r & g)
        tot += len(g)
    return hits / max(tot, 1)


def test_hash_tiles_match_oracle(setup):
    """Row r of the hashed tiles must be the u8-quantized mod-V bincount
    of posting r's doc (full forward row, nothing truncated)."""
    ds, arrays, _, _, _ = setup
    V = 128
    ha = hash_retile(arrays, V)
    assert ha.doc_tiles.shape[1] == V
    posts = np.asarray(arrays.postings)
    lps = np.asarray(arrays.list_len)
    total = int((np.asarray(arrays.list_post_start, np.int64)
                 + lps).max())
    rng = np.random.default_rng(0)
    for r in rng.choice(total, 50, replace=False):
        d = int(posts[r])
        s, e = ds.offsets[d], ds.offsets[d + 1]
        ref = np.zeros(V, np.float64)
        np.add.at(ref, ds.components[s:e] % V, ds.values[s:e])
        ref = ref.astype(np.float32)  # hash_retile accumulates via f64
        mx = ref.max()                # bincount then stores f32
        if mx == 0:
            assert (ha.doc_tiles[r] == 0).all()
            continue
        sc = np.float32(np.maximum(mx, np.float32(1e-20)) / 255.0)
        codes = np.round(ref / sc).astype(np.uint8)
        assert (ha.doc_tiles[r] == codes).all(), r
        assert abs(ha.doc_tile_scale[r] - sc) < 1e-6 * sc
    # tail padding rows stay zero
    assert (ha.doc_tiles[total:] == 0).all()
    assert (ha.doc_tile_scale[total:] == 0).all()


@pytest.mark.slow
def test_hash_search_recall(setup):
    """Hashed-tile grouped search must track the truncated-tile recall
    (both use the exact rescore; hashing only changes pooling)."""
    ds, arrays, q_comps, q_vals, gt_i = setup
    base = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                         pool_mode="exact")
    ctx = PlannerContext.from_arrays(arrays)
    dev = arrays.to_device(pallas_tiles=True)
    _, i_b = search_grouped(dev, ctx, q_comps, q_vals, base, query_cut=10)
    r_b = _recall(i_b, gt_i)

    # V=256 puts the bucket fill rate (~35 nnz / 256) at the bench
    # shape's (~150 nnz / 1024): collision inflation is the operative
    # noise, absorbed by the exact-rescore depth
    V = 256
    ha = hash_retile(arrays, V)
    devh = ha.to_device(pallas_tiles=True, tile_hash=V)
    assert devh.tile_hash == V and devh.vocab16 is None
    ctxh = PlannerContext.from_arrays(ha)
    hp = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                       compute_dtype="i8", pool_mode="stride",
                       pool_stride=4)
    _, i_h = search_grouped(devh, ctxh, q_comps, q_vals, hp, query_cut=10)
    assert _recall(i_h, gt_i) >= r_b - 0.03

    # heavy collisions (V=128: ~28% fill) are recovered by a deeper
    # exact rescore — hashed pool scores are upper bounds, so the true
    # top-k is IN the pool, just ranked lower
    ha128 = hash_retile(arrays, 128)
    dev128 = ha128.to_device(pallas_tiles=True, tile_hash=128)
    ctx128 = PlannerContext.from_arrays(ha128)
    hp96 = dataclasses.replace(hp, rescore=96)
    _, i_96 = search_grouped(dev128, ctx128, q_comps, q_vals, hp96,
                             query_cut=10)
    assert _recall(i_96, gt_i) >= r_b - 0.02

    # unrolled item-major kernel: identical results to U=1
    hpu = dataclasses.replace(hp, kernel_unroll=2)
    _, i_u = search_grouped(devh, ctxh, q_comps, q_vals, hpu,
                            query_cut=10)
    np.testing.assert_array_equal(i_u, i_h)

    # hier pool mode on hashed tiles (the bench operating point); the
    # tight pool=64 absorbs less collision inflation than pool=128 at
    # this tiny scale, hence the wider tolerance
    hph = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                        compute_dtype="i8", pool_mode="hier",
                        pool_per_pair=16)
    _, i_hh = search_grouped(devh, ctxh, q_comps, q_vals, hph,
                             query_cut=10)
    assert _recall(i_hh, gt_i) >= r_b - 0.05

    # f32 compute path (qsum correction) on hashed tiles
    hpf = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                        compute_dtype="f32", pool_mode="exact")
    _, i_f = search_grouped(devh, ctxh, q_comps, q_vals, hpf,
                            query_cut=10)
    assert _recall(i_f, gt_i) >= r_b - 0.03


@pytest.mark.slow
def test_sharded_hash_tiles():
    """Doc-sharded grouped search over HASHED tiles (tile_hash plumbed
    through ShardedIndex.build) must track the single-index hashed run:
    the query hash is shard-independent, so per-shard pools merge exactly
    like the truncated-tile path."""
    from seismic_tpu.parallel.mesh import make_mesh
    from seismic_tpu.parallel.sharded import ShardedIndex

    rng = np.random.default_rng(3)
    from tests.conftest import make_random_dataset as mkds
    from tests.conftest import make_random_queries as mkq

    ds = mkds(rng, n_docs=240, dim=400, min_nnz=10, max_nnz=30, seed=21)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256))
    qc, qv = mkq(np.random.default_rng(4), n_queries=8, dim=400,
                 min_nnz=6, max_nnz=20)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    gp = GroupedParams(k=10, score_cut=64, pool=64, rescore=32,
                       compute_dtype="i8", pool_mode="stride",
                       pool_stride=4)

    from seismic_tpu.ops.pallas_tiles import hash_retile

    arrays = build_index(ds, cfg)
    ha = hash_retile(arrays, 128)
    dev = ha.to_device(pallas_tiles=True, tile_hash=128)
    ctx = PlannerContext.from_arrays(ha)
    s_ref, i_ref = search_grouped(dev, ctx, q_comps, q_vals, gp,
                                  query_cut=8)

    mesh = make_mesh(n_docs_shards=4, n_data=1)
    sharded = ShardedIndex.build(ds, mesh, cfg, pallas_tiles=True,
                                 tile_hash=128)
    s_sh, i_sh = sharded.search_batch_grouped(q_comps, q_vals, gp,
                                              query_cut=8)
    for b in range(len(i_ref)):
        ref = {int(d): float(s) for s, d in zip(s_ref[b], i_ref[b])
               if d >= 0}
        got = {int(d): float(s) for s, d in zip(s_sh[b], i_sh[b])
               if d >= 0}
        shared = set(ref) & set(got)
        assert len(shared) >= 5
        for d in shared:
            assert abs(ref[d] - got[d]) < 1e-3 * max(1.0, abs(ref[d]))


def test_tile_hash_v_removed_fails_loudly():
    """The public tile_hash_v knob is dead (round-3 device grid: recall
    collapsed to 0.55-0.67 at bench scale — docs/Roadmap.md). An index
    config that still sets it must fail loudly at construction, never
    silently serve collapsed recall (round-3 verdict weak #5)."""
    with pytest.raises(ValueError, match="tile_hash_v was removed"):
        TpuLayout(max_block_len=16, summary_vocab_cap=256, tile_hash_v=128)
