"""Pallas fused tile scorer vs the XLA dynamic-slice formulation.

Runs in Mosaic interpret mode on CPU (the same kernel compiles natively on
TPU; measured bit-exact and ~27% faster there, see ops/pallas_tiles.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from seismic_tpu.build.builder import build_index
from seismic_tpu.config import Configuration, TpuLayout
from seismic_tpu.ops.pallas_tiles import (
    SUB,
    pallas_align_doc_tiles,
    score_tiles_pallas,
)
from tests.conftest import make_random_dataset


def test_pallas_tile_scorer_matches_xla(rng):
    ds = make_random_dataset(rng, n_docs=300, dim=500, seed=77)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=128))
    arrays = build_index(ds, cfg)
    ll_pad = ((max(arrays.max_list_len, 1) + SUB - 1) // SUB) * SUB
    tiles_i8, scale3d, region_start, _ = pallas_align_doc_tiles(
        arrays, ll_pad
    )

    BQ = 16
    r = np.random.default_rng(3)
    pair_lists = r.integers(0, arrays.n_lists, size=BQ)
    tb_idx = jnp.asarray(region_start[pair_lists])
    qloc = jnp.asarray(
        r.random((BQ, tiles_i8.shape[1])).astype(np.float32)
    )

    out = np.asarray(
        score_tiles_pallas(
            jnp.asarray(tiles_i8), jnp.asarray(scale3d), tb_idx, qloc,
            ll_pad, interpret=True,
        )
    )

    tiles_u8 = tiles_i8.view(np.uint8).astype(np.float32)
    scale = scale3d[:, 0, :].reshape(-1)
    for p in range(BQ):
        s = int(region_start[pair_lists[p]]) * SUB
        ref = (tiles_u8[s : s + ll_pad] @ np.asarray(qloc[p])) * scale[
            s : s + ll_pad
        ]
        assert np.allclose(out[p], ref, rtol=1e-4, atol=1e-3)


def test_aligned_layout_cache_roundtrip(rng, tmp_path):
    """load_or_build_aligned must rebuild-then-mmap the exact layout
    prepare_pallas_tiles returns, and invalidate on a source rewrite."""
    from seismic_tpu.ops_pallas_prep import (
        load_or_build_aligned,
        prepare_pallas_tiles,
    )

    ds = make_random_dataset(rng, n_docs=250, dim=400, seed=5)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=128))
    arrays = build_index(ds, cfg)
    idx_dir = str(tmp_path / "idx.dir")
    arrays.save_dir(idx_dir)

    ref = prepare_pallas_tiles(arrays, csub=2)
    built = load_or_build_aligned(arrays, idx_dir, csub=2)  # builds
    cached = load_or_build_aligned(arrays, idx_dir, csub=2)  # mmaps
    assert isinstance(cached[0], np.memmap)
    for a, b, c in zip(ref[:3], built[:3], cached[:3]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert np.array_equal(np.asarray(a), np.asarray(c))
    assert ref[3] is None and built[3] is None and cached[3] is None

    # a rewritten source index invalidates the cache
    import os
    import time as _t

    probe = os.path.join(idx_dir, os.listdir(idx_dir)[0])
    _t.sleep(0.02)
    os.utime(probe, None)
    rebuilt = load_or_build_aligned(arrays, idx_dir, csub=2)
    assert not isinstance(rebuilt[0], np.memmap)
