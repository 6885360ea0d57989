"""Pallas TPU kernel: grouped doc-tile scorer (round-2 fast path).

One grid step = one work item = one (group, subtile): stream a [SUB, V] u8
doc tile HBM->VMEM (double-buffered by the Pallas pipeline) and score it
against the group's M query projections with a single MXU matmul
[M, V] @ (V, SUB) -> [M, SUB]. Compared to the round-1 kernel
(ops/pallas_tiles.py), each streamed tile now serves M queries (the
VERDICT's "invert the loop" item) and the work list is exact per subtile,
so ragged list lengths cost no DMA or FLOPs.

The work list and group layout come from the host planner
(search/planner.py). Scalar-prefetched arrays drive all three
data-dependent BlockSpecs.

Constraints honored (probed on-device, see memory notes / round-1 probes):
- block shapes (8, 128)-divisible in the last two dims (3D leading 1 ok):
  M >= 8, V multiple of 128, SUB = 128;
- per-row scales carried as [n_sub, 8, 128] replicated blocks;
- no u8->f32 cast in Mosaic: tiles viewed int8, +256 where negative.

Reference parity: this computes the same per-posting dot products as the
reference's block scan (src/posting_list.rs:188-215) over every posting of
the selected lists (the full_lists limit), restricted to the list's local
vocabulary (overflow entries are re-added downstream).
"""

from __future__ import annotations

SUB = 128


def score_grouped_pallas(
    doc_tiles_i8,  # int8 [n_sub_total * SUB, V]
    tile_scale3d,  # f32 [n_sub_total, 8, 128]
    qloc,  # f32 [G_cap, M, V] per-slot query projections
    work_region,  # int32 [W_cap] SUPER-tile address per work item
    work_g,  # int32 [W_cap] destination group
    work_s,  # int32 [W_cap] super-tile slot within group
    ll_max: int,  # output row capacity per group (multiple of csub*SUB)
    interpret: bool = False,
    compute_dtype: str = "bf16",
    qsum=None,  # f32 [G_cap, M, 128] lane-replicated 128*sum_v(qloc[g,m,:])
    csub: int = 1,  # subtiles per work item (aligned-layout granularity)
    pack_idx: bool = False,  # pack (score bits | row index) into int32 out
    pack_window: int = 1,  # in-kernel max over pack_window 128-col slices:
    # conflates rows >= 128 apart (always different k-means blocks) and
    # shrinks the kernel output pack_window-fold at zero extra traffic —
    # the slot-grid output is ~68% padding, so every downstream byte
    # saved here is a real byte. Requires pack_idx and
    # csub * SUB // pack_window % 128 == 0.
    unroll: int = 1,  # work items per grid step (i8 path only); > 1
    # switches the output to work-item-major [W_cap, M, STEP]
):
    """Returns UNMASKED scores f32 [G_cap, M, ll_max] (or packed int32
    [G_cap, M, ll_max // pack_window] with pack_idx); blocks not covered
    by a work item hold garbage (caller masks with group_nrows/slot
    validity).

    compute_dtype "bf16" runs the matmul at the MXU's native width (u8
    codes 0..255 are exact in bf16; only the qloc operand is rounded to
    8 mantissa bits — below the u8 quantization error of the tiles);
    "f32" is the exact-operand reference.

    When `qsum` is given, the kernel recenters tiles with a single XOR
    (u8 - 128 reinterpreted as int8) instead of the 4-op compare fixup
    — qloc . u8 == qloc . (u8 - 128) + 128 * sum(qloc) — cutting the
    per-element VPU work that dominated the round-2 kernel.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G_cap, M, V = qloc.shape
    W_cap = work_region.shape[0]
    assert M % 8 == 0 and V % 128 == 0 and ll_max % (csub * SUB) == 0
    if compute_dtype == "i8":
        # int8 MXU path: qloc is pre-quantized int8 (per-pair scale applied
        # downstream, in the regroup stage); the qsum centering term is
        # computed in-kernel from the int8 operand, so no qsum operand.
        assert qloc.dtype == jnp.int8
        return _score_grouped_i8(
            doc_tiles_i8, tile_scale3d, qloc, work_region, work_g, work_s,
            ll_max, interpret, csub, pack_idx, pack_window, unroll,
        )
    assert unroll == 1, "unroll > 1 is i8-only"
    cdt = jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32

    ROWS = csub * SUB
    pack = _make_pack(ll_max, ROWS) if pack_idx else None
    STEP = _check_pack_window(pack_idx, pack_window, ROWS)

    def kernel_fixup(region_ref, g_ref, s_ref, tile_ref, scale_ref,
                     qloc_ref, out_ref):
        # i8 bits -> u8 value, fixup in f32 (Mosaic supports neither bf16
        # compares nor the i1-mask relayout an int8 compare + bf16 select
        # needs); the matmul operands then drop to compute_dtype
        t = tile_ref[:].astype(jnp.float32)
        t = (t + jnp.where(t < 0, 256.0, 0.0)).astype(cdt)
        q = qloc_ref[0].astype(cdt)  # [M, V]
        s = jax.lax.dot_general(
            q, t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [M, ROWS]
        out = s * scale_ref[0, 0, :][None, :]
        out_ref[0] = (_window_max(pack(out, s_ref), pack_window, STEP)
                      if pack else out)

    def kernel_centered(region_ref, g_ref, s_ref, tile_ref, scale_ref,
                        qloc_ref, qsum_ref, out_ref):
        t = (tile_ref[:] ^ jnp.int8(-128)).astype(cdt)  # u8 - 128
        q = qloc_ref[0].astype(cdt)  # [M, V]
        s = jax.lax.dot_general(
            q, t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [M, ROWS]
        out = (s + qsum_ref[0]) * scale_ref[0, 0, :][None, :]
        out_ref[0] = (_window_max(pack(out, s_ref), pack_window, STEP)
                      if pack else out)

    in_specs = [
        pl.BlockSpec(
            (ROWS, V),
            lambda w, region, g, s: (region[w], 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 8, ROWS),
            lambda w, region, g, s: (region[w], 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, M, V),
            lambda w, region, g, s: (g[w], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [doc_tiles_i8, tile_scale3d, qloc]
    kernel = kernel_fixup
    if qsum is not None:
        # qsum must be lane-replicated at the full ROWS width (an in-kernel
        # concatenate along lanes silently corrupted the second 128-lane
        # half on the real device — caught by the bench pallas gate)
        assert qsum.shape[-1] == ROWS, (qsum.shape, ROWS)
        in_specs.append(
            pl.BlockSpec(
                (1, M, ROWS),
                lambda w, region, g, s: (g[w], 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(qsum)
        kernel = kernel_centered

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(W_cap,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, M, STEP if pack_idx else ROWS),
            lambda w, region, g, s: (g[w], 0, s[w]),
            memory_space=pltpu.VMEM,
        ),
    )

    out_dtype = jnp.int32 if pack_idx else jnp.float32
    out_w = ll_max // pack_window if pack_idx else ll_max
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G_cap, M, out_w), out_dtype),
        interpret=interpret,
    )(work_region, work_g, work_s, *operands)


def _check_pack_window(pack_idx: bool, pack_window: int, rows: int) -> int:
    """Validate pack_window and return the per-item output width (STEP)."""
    if pack_window <= 1:
        return rows
    assert pack_idx, "pack_window > 1 requires pack_idx"
    step = rows // pack_window
    assert step * pack_window == rows and step % 128 == 0, (
        f"pack_window {pack_window} needs csub*SUB ({rows}) divisible "
        "into 128-multiple slices"
    )
    return step


def _window_max(p, rk: int, step: int):
    """Integer max over rk 128-aligned lane slices of the packed [M, ROWS]
    scores: conflated rows are `step` >= 128 apart — always different
    k-means blocks, so the conflated docs are dissimilar by construction.
    Lane slices at 128-multiples are free in Mosaic (no relayout)."""
    import jax.numpy as jnp

    if rk <= 1:
        return p
    out = p[:, :step]
    for u in range(1, rk):
        out = jnp.maximum(out, p[:, u * step:(u + 1) * step])
    return out


def _make_pack(ll_max: int, rows: int):
    """Kernel epilogue: replace the low index bits of each (non-negative)
    f32 score's bit pattern with the row's position inside the group —
    integer max over the packed values then selects BOTH the window's best
    score (to ~2^-14 relative, far below the u8 tile quantization) and its
    posting offset, so the pooling stage is one reduce_window over int32
    (no separate argmax pass, no full-width regroup gather)."""
    import jax
    import jax.numpy as jnp

    idx_bits = max(1, (ll_max - 1).bit_length())
    mask = (1 << idx_bits) - 1

    def pack(s, s_ref, w_item=None):
        import jax.experimental.pallas as pl

        w = pl.program_id(0) if w_item is None else w_item
        bits = jax.lax.bitcast_convert_type(s, jnp.int32)
        col = (
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            + s_ref[w] * rows
        )
        return (bits & jnp.int32(~mask)) | col

    return pack


def _score_grouped_i8(
    doc_tiles_i8,  # int8 [n_sub_total * SUB, V]
    tile_scale3d,  # f32 [n_super, 8, csub*128]
    qloc_i8,  # int8 [G_cap, M, V] quantized query projections
    work_region,
    work_g,
    work_s,
    ll_max: int,
    interpret: bool,
    csub: int = 1,
    pack_idx: bool = False,
    pack_window: int = 1,
    unroll: int = 1,
):
    """int8 x int8 -> int32 MXU variant (2x the bf16 rate on v5e; probed in
    harness/microbench_qloc.py). Returns scores in QUANTIZED qloc units —
    the caller multiplies by the per-pair qloc scale during regroup:

        score = qscale[pair] * tile_scale[row] * (q_i8 . (u8-128) + 128*sum(q_i8))

    With `unroll` U > 1 the kernel processes U work items per grid step
    (U-fold fewer grid steps — the per-step Mosaic overhead of ~0.5 us
    dominated the round-2 kernel at bench shapes) and the output switches
    to WORK-ITEM-MAJOR layout [W_cap, M, STEP]: item w's scores land in
    row w (a group's items are consecutive, so the caller regroups via the
    per-group item prefix sum; see grouped._item_regroup).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G_cap, M, V = qloc_i8.shape
    W_cap = work_region.shape[0]
    ROWS = csub * SUB
    pack = _make_pack(ll_max, ROWS) if pack_idx else None
    STEP = _check_pack_window(pack_idx, pack_window, ROWS)
    if unroll > 1:
        return _score_grouped_i8_item(
            doc_tiles_i8, tile_scale3d, qloc_i8, work_region, work_g,
            work_s, ll_max, interpret, csub, pack, pack_window, STEP,
            unroll,
        )

    def kernel(region_ref, g_ref, s_ref, tile_ref, scale_ref, qloc_ref,
               out_ref):
        t = tile_ref[:] ^ jnp.int8(-128)  # u8 bits -> centered i8 (u8 - 128)
        q = qloc_ref[0]  # int8 [M, V]
        dot = jax.lax.dot_general(
            q, t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [M, ROWS] i32
        rowsum = jnp.sum(q.astype(jnp.int32), axis=1, keepdims=True)  # [M,1]
        s = (dot + 128 * rowsum).astype(jnp.float32)
        out = s * scale_ref[0, 0, :][None, :]
        out_ref[0] = (_window_max(pack(out, s_ref), pack_window, STEP)
                      if pack else out)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(W_cap,),
        in_specs=[
            pl.BlockSpec(
                (ROWS, V),
                lambda w, region, g, s: (region[w], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, ROWS),
                lambda w, region, g, s: (region[w], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, M, V),
                lambda w, region, g, s: (g[w], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, M, STEP if pack_idx else ROWS),
            lambda w, region, g, s: (g[w], 0, s[w]),
            memory_space=pltpu.VMEM,
        ),
    )

    out_dtype = jnp.int32 if pack_idx else jnp.float32
    out_w = ll_max // pack_window if pack_idx else ll_max
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G_cap, M, out_w), out_dtype),
        interpret=interpret,
    )(work_region, work_g, work_s, doc_tiles_i8, tile_scale3d, qloc_i8)


def _score_grouped_i8_item(
    doc_tiles_i8,
    tile_scale3d,
    qloc_i8,
    work_region,
    work_g,
    work_s,
    ll_max: int,
    interpret: bool,
    csub: int,
    pack,  # pack(s, s_ref, w_item) -> packed int32, or None
    pack_window: int,
    STEP: int,
    unroll: int,
):
    """U-way unrolled item-major scorer: grid (W_cap // U,), each step
    DMAs U doc super-tiles (each with its own double-buffered BlockSpec
    stream) and writes a (U, M, STEP) output block at row w*U. Returns
    [W_cap, M, STEP] (packed int32 or f32)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G_cap, M, V = qloc_i8.shape
    W_cap = work_region.shape[0]
    ROWS = csub * SUB
    U = unroll
    assert W_cap % U == 0, (W_cap, U)

    def kernel(region_ref, g_ref, s_ref, *refs):
        out_ref = refs[-1]
        w = pl.program_id(0)
        for u in range(U):
            tile_ref = refs[3 * u]
            scale_ref = refs[3 * u + 1]
            qloc_ref = refs[3 * u + 2]
            t = tile_ref[:] ^ jnp.int8(-128)
            q = qloc_ref[0]
            dot = jax.lax.dot_general(
                q, t, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [M, ROWS] i32
            rowsum = jnp.sum(q.astype(jnp.int32), axis=1, keepdims=True)
            s = (dot + 128 * rowsum).astype(jnp.float32)
            out = s * scale_ref[0, 0, :][None, :]
            if pack is not None:
                out = _window_max(
                    pack(out, s_ref, w * U + u), pack_window, STEP
                )
            out_ref[u] = out

    in_specs = []
    operands = []
    for u in range(U):
        in_specs.append(pl.BlockSpec(
            (ROWS, V),
            lambda w, region, g, s, u=u: (region[w * U + u], 0),
            memory_space=pltpu.VMEM,
        ))
        operands.append(doc_tiles_i8)
        in_specs.append(pl.BlockSpec(
            (1, 8, ROWS),
            lambda w, region, g, s, u=u: (region[w * U + u], 0, 0),
            memory_space=pltpu.VMEM,
        ))
        operands.append(tile_scale3d)
        in_specs.append(pl.BlockSpec(
            (1, M, V),
            lambda w, region, g, s, u=u: (g[w * U + u], 0, 0),
            memory_space=pltpu.VMEM,
        ))
        operands.append(qloc_i8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(W_cap // U,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (U, M, STEP),
            lambda w, region, g, s: (w, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out_dtype = jnp.int32 if pack is not None else jnp.float32
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((W_cap, M, STEP), out_dtype),
        interpret=interpret,
    )(work_region, work_g, work_s, *operands)
