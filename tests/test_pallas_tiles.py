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
