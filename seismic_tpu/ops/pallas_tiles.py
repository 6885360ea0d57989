"""Pallas TPU kernel: fused doc-tile scorer.

Scores the replicated dense doc tiles of each selected list against the
per-list query projections with an explicitly pipelined Mosaic kernel: the
grid walks (pair-group, list-subtile, pair-in-group) and data-dependent
BlockSpec index_maps (driven by a scalar-prefetched array of per-pair
region offsets) stream [SUB, V] u8 tiles HBM->VMEM double-buffered while
the MXU computes the previous tile's [SUB, V] @ [V, 1] product.

Constraints honored (probed on-device, harness/device_probe.py):
- block shapes multiples of (8, 128) in the last two dims: SUB=128 rows,
  V multiple of 128; per-row scales carried in a [*, 8, 128] replicated
  layout so their blocks are legal;
- list tile regions aligned to SUB rows (`pallas_align_doc_tiles`);
- no u8->f32 cast in Mosaic: tiles are viewed as int8 and corrected
  (+256 where negative) before the matmul.

Opt-in via `SearchParams.use_pallas`; the XLA dynamic-slice formulation
stays the default and the numerical reference.
"""

from __future__ import annotations

import numpy as np

SUB = 128
GROUP = 8


def score_tiles_pallas(
    doc_tiles_i8,  # int8 [n_sub_total * SUB, V] (u8 bits viewed as int8)
    tile_scale3d,  # f32 [n_sub_total, 8, 128] (per-row scale, 8x replicated)
    tile_block_idx,  # int32 [BQ] region start of each (b, qc) in SUB units
    qloc,  # f32 [BQ, V]
    ll_pad: int,  # rows scored per (b, qc); multiple of SUB
    interpret: bool = False,
):
    """Returns UNMASKED scores f32 [BQ, ll_pad] (caller masks beyond each
    list's real length)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BQ, V = qloc.shape
    assert BQ % GROUP == 0 and ll_pad % SUB == 0
    n_sub = ll_pad // SUB
    G = BQ // GROUP

    def kernel(idx_ref, tile_ref, scale_ref, qloc_ref, out_ref):
        r = pl.program_id(2)
        t = tile_ref[:].astype(jnp.float32)
        t = t + jnp.where(t < 0, 256.0, 0.0)  # i8 bits -> u8 value
        q = qloc_ref[r, :].reshape(V, 1)
        s = jax.lax.dot_general(
            t, q, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(SUB)
        out_ref[r, :] = s * scale_ref[0, 0, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, n_sub, GROUP),
        in_specs=[
            pl.BlockSpec(
                (SUB, V),
                lambda g, s, r, idx: (idx[g * GROUP + r] + s, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, 128),
                lambda g, s, r, idx: (idx[g * GROUP + r] + s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (GROUP, V),
                lambda g, s, r, idx: (g, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (GROUP, SUB),
            lambda g, s, r, idx: (g, s),
            memory_space=pltpu.VMEM,
        ),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BQ, ll_pad), jnp.float32),
        interpret=interpret,
    )(tile_block_idx, doc_tiles_i8, tile_scale3d, qloc)


def tile_region_starts(arrays, csub: int = 1) -> np.ndarray:
    """Subtile (SUB-row unit) start of each list's region in the aligned
    tile layout. With csub > 1 every list's region is padded to a multiple
    of csub subtiles, so work items covering csub consecutive subtiles
    (one [csub*SUB, V] DMA, amortizing per-grid-step overhead) stay
    block-aligned. Pure metadata — does NOT materialize the tiles."""
    list_len = arrays.list_len.astype(np.int64)
    n_tiles_per_list = np.maximum(1, -(-list_len // SUB))
    if csub > 1:
        n_tiles_per_list = csub * (-(-n_tiles_per_list // csub))
    region_start = np.zeros(len(list_len), dtype=np.int64)
    np.cumsum(n_tiles_per_list[:-1], out=region_start[1:])
    return region_start


def pallas_align_doc_tiles(arrays, ll_pad: int, csub: int = 1):
    """Re-pack `doc_tiles`/`doc_tile_scale` so every list's region starts at
    a multiple of SUB rows (csub*SUB rows when csub > 1); the tail is
    padded by `ll_pad` rows so any region can stream `ll_pad` rows without
    bounds checks.

    Returns (tiles int8 [n_sub_total*SUB, V], scale3d f32
    [n_super, 8, csub*128], region_start_subtiles int32 [n_lists]).
    Host-side, one-off per index (vectorized: one fancy-index row copy)."""
    assert ll_pad % (csub * SUB) == 0
    list_len = arrays.list_len.astype(np.int64)
    n_tiles_per_list = np.maximum(1, -(-list_len // SUB))
    if csub > 1:
        n_tiles_per_list = csub * (-(-n_tiles_per_list // csub))
    region_start = tile_region_starts(arrays, csub)
    n_sub_total = int(n_tiles_per_list.sum()) + ll_pad // SUB
    total_rows = n_sub_total * SUB
    V = arrays.doc_tiles.shape[1]
    tiles = np.zeros((total_rows, V), dtype=np.uint8)
    scale = np.zeros(total_rows, dtype=np.float32)
    total = int(list_len.sum())
    if total:
        # flat (src, dst) row indices for every real posting row
        starts = np.zeros(len(list_len), dtype=np.int64)
        np.cumsum(list_len[:-1], out=starts[1:])
        intra = np.arange(total, dtype=np.int64) - np.repeat(starts, list_len)
        src_idx = np.repeat(
            arrays.list_post_start.astype(np.int64), list_len
        ) + intra
        dst_idx = np.repeat(region_start * SUB, list_len) + intra
        tiles[dst_idx] = arrays.doc_tiles[src_idx]
        scale[dst_idx] = arrays.doc_tile_scale[src_idx]
    lanes = csub * SUB
    n_super = total_rows // lanes
    scale3d = np.repeat(
        scale.reshape(n_super, 1, lanes), 8, axis=1
    ).astype(np.float32)
    return tiles.view(np.int8), scale3d, region_start.astype(np.int32)


def super_tile_summaries(tiles_u8_or_i8, scale3d, csub: int):
    """Per-super-tile component-wise UPPER BOUNDS of the aligned doc
    tiles: ub[s, v] = max_r code[r, v] * scale[r] over the super-tile's
    rows, re-quantized to u8 with a per-super scale. The streaming-budget
    mode ranks work items by query . ub — the TPU analogue of the
    reference's summary-guided block skip (posting_list.rs:115-146) at
    super-tile granularity. ~0.4% of the tile bytes.

    Returns (codes u8 [n_super, V], scale f32 [n_super])."""
    tiles = tiles_u8_or_i8.view(np.uint8)
    total_rows, V = tiles.shape
    lanes = csub * SUB
    n_super = total_rows // lanes
    row_scale = np.ascontiguousarray(scale3d[:, 0, :]).reshape(-1)
    codes = np.zeros((n_super, V), np.uint8)
    scales = np.zeros(n_super, np.float32)
    chunk = max(1, (1 << 26) // (lanes * V))  # ~64MB f32 working set
    for s0 in range(0, n_super, chunk):
        s1 = min(s0 + chunk, n_super)
        t = tiles[s0 * lanes: s1 * lanes].astype(np.float32)
        t *= row_scale[s0 * lanes: s1 * lanes, None]
        ub = t.reshape(s1 - s0, lanes, V).max(axis=1)  # [chunk, V]
        mx = ub.max(axis=1)
        sc = np.maximum(mx, 1e-20) / 255.0
        codes[s0:s1] = np.ceil(ub / sc[:, None]).clip(0, 255).astype(
            np.uint8
        )
        scales[s0:s1] = sc
    return codes, scales
