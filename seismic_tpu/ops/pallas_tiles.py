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
    if getattr(arrays, "pack_bins", False):
        return packed_region_layout(arrays.list_len, csub)[0]
    list_len = arrays.list_len.astype(np.int64)
    n_tiles_per_list = np.maximum(1, -(-list_len // SUB))
    if csub > 1:
        n_tiles_per_list = csub * (-(-n_tiles_per_list // csub))
    region_start = np.zeros(len(list_len), dtype=np.int64)
    np.cumsum(n_tiles_per_list[:-1], out=region_start[1:])
    return region_start


def packed_region_layout(list_len, csub: int = 1):
    """Bin-packed aligned layout for views whose lists are tiny compared
    to the csub*SUB-row region grain (the block view: ~12 block rows per
    list on the 100K bench vs 128-256-row regions — a 20x padding blowup
    that sank the lean-memory story, round-4 mem stage OOM).

    Lists are packed NEXT-FIT in id order into csub*SUB-row bins: a list
    that does not fit the open bin's remainder starts a new bin; a list
    longer than one bin gets an exclusive multi-super-tile region
    (row_off 0), exactly like the unpacked layout. Each list therefore
    spans rows [row_off, row_off + len) of ONE work item's DMA window
    (or an exclusive region), and the kernel's per-pair output carries
    bin-mates' rows as garbage that the regroup masks drop
    (search/grouped.py lower-bound masks).

    Returns (region_start int64 [n_lists] in SUBTILE units, csub-aligned;
    row_off int32 [n_lists] rows within the region; n_sub_total subtiles
    in the packed body)."""
    ll = np.asarray(list_len, np.int64)
    n = len(ll)
    cap = csub * SUB
    region_start = np.zeros(n, np.int64)
    row_off = np.zeros(n, np.int32)
    cur_bin = 0  # super-tile index of the open bin
    cur_fill = cap  # rows used in the open bin (cap => none open)
    next_sup = 0  # next free super-tile index
    for li in range(n):
        ln = int(ll[li])
        if ln == 0:
            continue  # empty list: region 0 / row_off 0, never planned
        if ln > cap:
            # exclusive region (multi super-tile), standard alignment
            nsup = -(-(-(-ln // SUB)) // csub)
            region_start[li] = next_sup * csub
            next_sup += nsup
            cur_fill = cap  # bins never straddle an exclusive region
            continue
        if ln > cap - cur_fill:
            cur_bin = next_sup
            next_sup += 1
            cur_fill = 0
        region_start[li] = cur_bin * csub
        row_off[li] = cur_fill
        cur_fill += ln
    return region_start, row_off, next_sup * csub


def pallas_align_doc_tiles(arrays, ll_pad: int, csub: int = 1):
    """Re-pack `doc_tiles`/`doc_tile_scale` so every list's region starts at
    a multiple of SUB rows (csub*SUB rows when csub > 1); the tail is
    padded by `ll_pad` rows so any region can stream `ll_pad` rows without
    bounds checks.

    Returns (tiles int8 [n_sub_total*SUB, V], scale3d f32
    [n_super, 8, csub*128], region_start_subtiles int32 [n_lists],
    row_off int32 [n_lists] or None). row_off is non-None only for
    bin-packed views (arrays.pack_bins, packed_region_layout): each
    list's rows then start at region_start*SUB + row_off. Host-side,
    one-off per index (vectorized: one fancy-index row copy)."""
    assert ll_pad % (csub * SUB) == 0
    list_len = arrays.list_len.astype(np.int64)
    row_off = None
    if getattr(arrays, "pack_bins", False):
        region_start, row_off, n_sub_body = packed_region_layout(
            list_len, csub
        )
        dst_base = region_start * SUB + row_off
    else:
        n_tiles_per_list = np.maximum(1, -(-list_len // SUB))
        if csub > 1:
            n_tiles_per_list = csub * (-(-n_tiles_per_list // csub))
        region_start = tile_region_starts(arrays, csub)
        n_sub_body = int(n_tiles_per_list.sum())
        dst_base = region_start * SUB
    n_sub_total = n_sub_body + ll_pad // SUB
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
        dst_idx = np.repeat(dst_base, list_len) + intra
        tiles[dst_idx] = arrays.doc_tiles[src_idx]
        scale[dst_idx] = arrays.doc_tile_scale[src_idx]
    lanes = csub * SUB
    n_super = total_rows // lanes
    scale3d = np.repeat(
        scale.reshape(n_super, 1, lanes), 8, axis=1
    ).astype(np.float32)
    return (tiles.view(np.int8), scale3d, region_start.astype(np.int32),
            None if row_off is None else row_off.astype(np.int32))


def residue_layout(V: int, R: int):
    """Static column layout of a residue-R-ordered local vocabulary:
    R groups of VRS slots (residue groups) + one SPILL region holding
    each list's per-group overflow (compared against ALL query terms in
    the kernel, so overflow costs compares, not recall). VRS is the
    largest multiple of 8 (sublane alignment) with spill >= V/8.
    Returns (VRS, spill)."""
    assert V % 8 == 0
    vrs = ((V - V // 8) // R) // 8 * 8
    return vrs, V - R * vrs


def residue_permute_arrays(arrays, R: int = 8):
    """Reorder every list's local vocabulary (and the matching doc-tile /
    dense-summary columns) into R STATIC residue groups of VRS slots plus
    a spill region (residue_layout): group r holds the list's terms with
    `term % R == r` in their original (importance) order; each group's
    overflow goes to the spill region (importance-ordered across groups),
    and only spill overflow drops terms (to the out-of-vocab path, like
    vocab-width truncation — rare: term ids are uncorrelated with
    `id % R`, so groups are near-uniform).

    The residue-bucketed qloc kernel (ops/pallas_qloc.py::
    project_qloc_residue) then compares each residue-group slot against
    only the query terms of ITS residue, and only the spill slots against
    the full term list — ~3x fewer VPU compare ops at V=1024 than the
    full unrolled scan, which dominated the round-2 qloc chain (~12.5 ms
    of a 48 ms batch).

    Mutates a SHALLOW copy of `arrays` (new list_vocab / doc_tiles /
    dense_summary buffers) and returns it."""
    import dataclasses as _dc

    from ..data.sparse import PAD_COMPONENT

    lv = np.asarray(arrays.list_vocab)
    n_lists, V = lv.shape
    assert V % R == 0, (V, R)
    VRS, SPILL = residue_layout(V, R)
    valid = (lv >= 0) & (lv != PAD_COMPONENT)
    res = np.where(valid, lv.astype(np.int64) % R, R)
    perm_src = np.argsort(res, axis=1, kind="stable")  # [n_lists, V]
    rs = np.take_along_axis(res, perm_src, axis=1)
    col = np.broadcast_to(np.arange(V, dtype=np.int64), (n_lists, V))
    new_grp = np.empty((n_lists, V), bool)
    new_grp[:, 0] = True
    np.not_equal(rs[:, 1:], rs[:, :-1], out=new_grp[:, 1:])
    seg_start = np.maximum.accumulate(np.where(new_grp, col, 0), axis=1)
    rank = col - seg_start
    in_group = (rank < VRS) & (rs < R)
    spilled = (rank >= VRS) & (rs < R)
    # spill slots in importance order (perm_src = original importance col)
    spill_key = np.where(spilled, perm_src, V + col)
    spill_rank = np.empty((n_lists, V), np.int64)
    np.put_along_axis(
        spill_rank, np.argsort(spill_key, axis=1, kind="stable"),
        col, axis=1,
    )
    dst = np.where(
        in_group,
        rs * VRS + rank,
        np.where(
            spilled & (spill_rank < SPILL),
            R * VRS + spill_rank,
            V,  # dropped
        ),
    )

    # new vocab + per-list source-column map (V -> zero column)
    new_vocab = np.full((n_lists, V + 1), -1, lv.dtype)
    np.put_along_axis(
        new_vocab, dst, np.take_along_axis(lv, perm_src, axis=1), axis=1
    )
    new_vocab = new_vocab[:, :V]
    src_of_dst = np.full((n_lists, V + 1), V, np.int64)
    np.put_along_axis(src_of_dst, dst, perm_src, axis=1)
    src_of_dst = src_of_dst[:, :V]

    out = _dc.replace(arrays) if _dc.is_dataclass(arrays) else arrays
    out.list_vocab = new_vocab

    list_len = np.asarray(arrays.list_len, np.int64)
    post_start = np.asarray(arrays.list_post_start, np.int64)
    tiles = np.asarray(arrays.doc_tiles)
    new_tiles = np.zeros_like(tiles)
    total = int(list_len.sum())
    if total:
        starts = np.zeros(len(list_len), dtype=np.int64)
        np.cumsum(list_len[:-1], out=starts[1:])
        row_of = np.repeat(post_start, list_len) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(starts, list_len)
        )
        list_of = np.repeat(
            np.arange(n_lists, dtype=np.int64), list_len
        )
        src32 = src_of_dst.astype(np.int32)
        CHUNK = max(1, (1 << 28) // (4 * V))  # ~256 MB index working set
        for c0 in range(0, total, CHUNK):
            c1 = min(c0 + CHUNK, total)
            rows = row_of[c0:c1]
            blk = tiles[rows]
            ext = np.concatenate(
                [blk, np.zeros((len(rows), 1), tiles.dtype)], axis=1
            )
            new_tiles[rows] = np.take_along_axis(
                ext, src32[list_of[c0:c1]], axis=1
            )
    out.doc_tiles = new_tiles

    if getattr(arrays, "dense_summary", None) is not None:
        dsum = np.asarray(arrays.dense_summary)
        nblk = np.asarray(arrays.list_n_blocks, np.int64)
        bstart = np.asarray(arrays.list_block_start, np.int64)
        new_dsum = np.zeros_like(dsum)
        for li in range(n_lists):
            nb_ = int(nblk[li])
            if nb_ == 0:
                continue
            b0 = int(bstart[li])
            src = src_of_dst[li]
            blk = dsum[b0:b0 + nb_]
            ext = np.concatenate(
                [blk, np.zeros((nb_, 1), dsum.dtype)], axis=1
            )
            new_dsum[b0:b0 + nb_] = ext[:, src]
        out.dense_summary = new_dsum

    out.vocab_residue = R
    out._residue_dropped = int(valid.sum() - (new_vocab >= 0).sum())
    return out


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


def hash_retile(arrays, V: int, chunk: int = 65536):
    """Replace the per-list truncated-vocab doc tiles with HASHED tiles:
    column b of a posting row holds the SUM of that doc's values whose
    component id hashes to b (comp mod V), u8-quantized per row.

    Motivation (round 3): the truncated tiles drop every doc term outside
    the list's top-V vocabulary — at 1M docs that bounds candidate recall
    at ~0.95 (SCALE_BENCH.json) because a 400-posting list spans tens of
    thousands of distinct terms. Hashing drops NOTHING: every true
    query-term match contributes fully, and collisions only ADD mass
    (SPLADE values are non-negative), so hashed pool scores are upper
    bounds — surplus candidates are killed by the exact rescore, missing
    candidates cannot happen from truncation. It also collapses the query
    projection from one row per (query, list) PAIR to one row per QUERY
    (the hash is list-independent), removing the dominant qloc gather.
    Reference analogy: the reference's block summaries are also inflated
    upper-bound sketches (quantized_summary.rs:289-406); this applies the
    same economics at per-posting granularity, TPU-style.

    Returns a NEW IndexArrays with doc_tiles/doc_tile_scale replaced
    (fields share memory with the input except the tiles). The device
    upload must set to_device(tile_hash=V) so the grouped path hashes the
    query instead of projecting it per pair."""
    import dataclasses as _dc

    from ..data.sparse import PAD_COMPONENT as _PAD

    assert V % 128 == 0, "hashed tile width must be lane-aligned"
    fc = np.asarray(arrays.fwd_comps)
    n_docs, W = fc.shape
    mask = fc != _PAD
    vals = np.asarray(arrays.fwd_vals).astype(np.float32)
    if arrays.fwd_val_step is not None:
        vals = (vals * np.asarray(arrays.fwd_val_step)[:, None]
                + np.asarray(arrays.fwd_val_min)[:, None])
    vals = np.where(mask, vals, 0.0)
    cols = np.where(mask, fc % V, 0).astype(np.int64)

    # hashed doc matrix (chunked bincount: PAD slots carry 0.0 weight)
    H = np.zeros((n_docs, V), np.float32)
    for s in range(0, n_docs, chunk):
        e = min(n_docs, s + chunk)
        r = np.repeat(np.arange(e - s, dtype=np.int64), W)
        flat = r * V + cols[s:e].reshape(-1)
        H[s:e] = np.bincount(
            flat, weights=vals[s:e].reshape(-1), minlength=(e - s) * V
        ).reshape(e - s, V)

    lps = np.asarray(arrays.list_post_start, np.int64)
    ll = np.asarray(arrays.list_len, np.int64)
    total = int((lps + ll).max()) if len(lps) else 0
    if arrays.doc_tiles is not None:
        n_rows = arrays.doc_tiles.shape[0]
    else:
        n_rows = total + arrays.max_block_len + arrays.max_list_len
    posts = np.asarray(arrays.postings)
    tiles = np.zeros((n_rows, V), np.uint8)
    scale = np.zeros(n_rows, np.float32)
    for s in range(0, total, chunk):
        e = min(total, s + chunk)
        rows = H[posts[s:e]]
        mx = rows.max(axis=1)
        sc = np.maximum(mx, 1e-20) / 255.0
        tiles[s:e] = np.round(rows / sc[:, None]).astype(np.uint8)
        scale[s:e] = np.where(mx > 0, sc, 0.0)
    return _dc.replace(arrays, doc_tiles=tiles, doc_tile_scale=scale)


def narrow_vocab(arrays, V0: int, chunk: int = 262144):
    """Derive a NARROWER-tile-vocab index from a built one without
    rebuilding: per list, keep only the V0 most important vocab columns
    (by build.builder's vocab_rank, 0 = largest summed doc value) and
    subset doc_tiles / dense_summary / list_vocab / vocab_rank to those
    columns. Reference analogy: built-index conversion
    (inverted_index.rs:237-284) — here converting the TPU layout's tile
    width instead of the value dtype, so one expensive build serves a
    width ladder of operating points (probe_r3n: V0=512 tiles at qc=14
    pool64/r48 hold recall 0.973 at half the kernel/qloc width).

    u8 codes and per-row scales are untouched — dropping columns never
    changes the remaining codes. Per-posting overflow arrays are kept as
    built: terms ranked between V0 and the build width leave the tile
    like any other out-of-vocab term (their mass returns in the exact
    rescore); they are NOT re-added to the overflow top-O.

    Returns a new IndexArrays sharing every unaffected field."""
    import dataclasses as _dc

    lv = np.asarray(arrays.list_vocab)
    vr = np.asarray(arrays.vocab_rank)
    n_lists, V = lv.shape
    assert V0 < V and V0 % 128 == 0, (V0, V)
    assert vr is not None and vr.shape == lv.shape
    # stable sort brings kept columns (rank < V0) first, in their
    # original (component-sorted) column order
    drop = vr >= V0
    colsel = np.argsort(drop, axis=1, kind="stable")[:, :V0]
    valid = np.take_along_axis(~drop, colsel, axis=1)
    new_lv = np.where(valid, np.take_along_axis(lv, colsel, axis=1),
                      lv.dtype.type(-1) if lv.dtype == np.int16
                      else lv.dtype.type(PAD_COMPONENT))
    new_vr = np.where(valid, np.take_along_axis(vr, colsel, axis=1),
                      np.int16(32767))

    ll = np.asarray(arrays.list_len, np.int64)
    lps = np.asarray(arrays.list_post_start, np.int64)

    def subset_rows(mat, row_list_id):
        out = np.zeros((mat.shape[0], V0), dtype=mat.dtype)
        for s in range(0, mat.shape[0], chunk):
            e = min(mat.shape[0], s + chunk)
            out[s:e] = np.take_along_axis(
                mat[s:e], colsel[row_list_id[s:e]], axis=1
            )
        return out

    new_tiles = None
    if arrays.doc_tiles is not None:
        total = int((lps + ll).max()) if len(lps) else 0
        row_list = np.zeros(arrays.doc_tiles.shape[0], np.int64)
        nz = ll > 0
        order = np.argsort(lps[nz], kind="stable")
        lid = np.repeat(np.arange(n_lists, dtype=np.int64)[nz][order],
                        ll[nz][order])
        row_list[:total] = lid
        new_tiles = subset_rows(np.asarray(arrays.doc_tiles), row_list)

    new_ds = None
    if arrays.dense_summary is not None:
        lnb = np.asarray(arrays.list_n_blocks, np.int64)
        lbs = np.asarray(arrays.list_block_start, np.int64)
        blk_list = np.zeros(arrays.dense_summary.shape[0], np.int64)
        for l in range(n_lists):
            if lnb[l]:
                blk_list[lbs[l]: lbs[l] + lnb[l]] = l
        new_ds = subset_rows(np.asarray(arrays.dense_summary), blk_list)

    cfg = arrays.config
    if cfg is not None and getattr(cfg, "layout", None) is not None:
        cfg = _dc.replace(cfg, layout=_dc.replace(
            cfg.layout, summary_vocab_cap=V0))
    return _dc.replace(
        arrays, list_vocab=new_lv, vocab_rank=new_vr,
        doc_tiles=new_tiles if new_tiles is not None else arrays.doc_tiles,
        dense_summary=new_ds if new_ds is not None else arrays.dense_summary,
        config=cfg,
    )


def order_block_members(arrays, chunk: int = 1 << 21):
    """Reorder the postings WITHIN each k-means block by the member's
    posting value (the doc's forward value for the block's list term),
    descending. Block geometry (block_start/block_len) is unchanged —
    only the member order inside each block moves.

    This makes a truncated expansion (GroupedParams.block_expand <
    max_block_len) drop each block's LEAST-valuable members for that
    list's term — the members least likely to enter the top-k via this
    list — instead of arbitrary ones. Returns a new IndexArrays with a
    permuted copy of `postings` (all other fields shared)."""
    import dataclasses as _dc

    from ..data.sparse import PAD_COMPONENT as _PAD

    lps = np.asarray(arrays.list_post_start, np.int64)
    ll = np.asarray(arrays.list_len, np.int64)
    posts = np.asarray(arrays.postings)
    bs = np.asarray(arrays.block_start, np.int64)
    bl = np.asarray(arrays.block_len, np.int64)
    total = int((lps + ll).max()) if len(lps) else 0

    # list id of every packed posting row: non-empty lists are packed
    # contiguously; repeat list ids in ascending-start order
    nz = ll > 0
    order = np.argsort(lps[nz], kind="stable")
    lid_packed = np.repeat(
        np.arange(len(ll), dtype=np.int64)[nz][order], ll[nz][order]
    )
    assert len(lid_packed) == total

    fc = np.asarray(arrays.fwd_comps)
    fv = np.asarray(arrays.fwd_vals)
    has_step = arrays.fwd_val_step is not None
    val = np.zeros(total, np.float32)
    for s in range(0, total, chunk):
        e = min(total, s + chunk)
        d = posts[s:e].astype(np.int64)
        rows = fc[d]
        m = rows == lid_packed[s:e, None]
        v = np.where(m, fv[d].astype(np.float32), 0.0).max(axis=1)
        if has_step:
            hit = m.any(axis=1)
            v = np.where(
                hit,
                v * np.asarray(arrays.fwd_val_step, np.float32)[d]
                + np.asarray(arrays.fwd_val_min, np.float32)[d],
                0.0,
            )
        val[s:e] = v

    # block id per packed posting row: blocks are contiguous in packed
    # order (block_start is a cumsum over block_len), covering [0, total)
    n_blocks = len(bs)
    real = bl > 0
    blk_of = np.repeat(np.arange(n_blocks, dtype=np.int64)[real],
                       bl[real])
    assert len(blk_of) == total, (len(blk_of), total)
    # stable sort by (block, -value): members move only within their
    # block (blocks are contiguous in packed order)
    perm = np.lexsort((-val, blk_of))
    new_posts = posts.copy()
    new_posts[:total] = posts[perm]
    return _dc.replace(arrays, postings=new_posts)


def block_pool_arrays(arrays, V: int, chunk: int = 262144,
                      order_members: bool = False, mode: str = "dense",
                      pack_bins: bool = False):
    """A blocks-as-rows VIEW of the index for the grouped scorer: BLOCK-
    SUMMARY tiles replace the per-posting doc tiles, and the list
    geometry fields are remapped so one "posting row" = one block.

    mode="dense" (default): tiles ARE the builder's dense_summary matrix
    — exact u8 summary values over the list's local vocab, scored
    through the normal per-pair qloc projection (upload with
    to_device(tile_hash=0)). probe_r3p: exact block ranking pools at
    0.975-0.977 (pool128) where the hashed rows stop at 0.90-0.94 —
    mod-V sketch noise loses candidates at block granularity too.
    To use a narrower V than the build width, narrow_vocab() FIRST,
    then take this view (V must equal dense_summary's width).

    mode="hash": collision-summed mod-V rows + per-QUERY projection
    (upload with to_device(tile_hash=V)); kept for A/B probes.

    This is the memory-lean configuration (VERDICT r2 item 3): device
    state is forward index + postings + block arrays + [n_blocks, V]
    hashed summaries — no per-posting tile replication. The grouped
    pipeline runs UNCHANGED over the block rows (the planner sees
    list_len = blocks-per-list); search_grouped's `block_expand` tail
    then expands each pooled block into its member postings and
    exact-rescores them — the TPU analogue of the reference's
    summary-skip + evaluate_posting_block economics
    (posting_list.rs:115-215), with the sequential heap threshold
    replaced by a fixed per-pair block pool.

    Summary entries decode as min + code * quant (build/summaries.py);
    hashing sums them into V buckets per block (upper-bound-ish sketch,
    exactly like the doc-tile hash).

    Returns a new IndexArrays sharing every array except:
      doc_tiles/doc_tile_scale -> hashed [nbp, V] u8 + scale
      list_post_start          -> list_block_start
      list_len                 -> list_n_blocks
      max_list_len             -> max_blocks_per_list
    (postings/block_start/block_len stay REAL: with
    GroupedParams.block_expand the pool emits block ids directly and the
    tail expands them through block_start/block_len into postings.)

    `order_members` reorders each block's postings by posting value
    (descending) first — see order_block_members — so a truncated
    expansion (block_expand < max_block_len) drops the least-valuable
    members.

    `pack_bins` marks the view for bin-packed aligned regions
    (packed_region_layout): ~20x less aligned-layout HBM at the 100K
    bench (lists average ~12 block rows vs csub*128-row regions) and
    proportionally less DMA per pair. Requires pool_mode hier/approx/
    exact/slot (the packed/window modes fold bin-mates in-kernel).
    """
    import dataclasses as _dc

    from ..data.sparse import PAD_COMPONENT as _PAD

    if order_members:
        arrays = order_block_members(arrays)
    assert V % 128 == 0
    if mode == "dense":
        assert arrays.dense_summary is not None and (
            arrays.dense_summary.shape[1] == V
        ), ("mode='dense' uses the built dense_summary; narrow_vocab() "
            "first for a narrower V", V,
            None if arrays.dense_summary is None
            else arrays.dense_summary.shape)
        return _dc_replace_block_view(
            arrays, np.asarray(arrays.dense_summary),
            np.asarray(arrays.dense_scale, np.float32),
            pack_bins=pack_bins)
    sc_comps = np.asarray(arrays.summary_comps)
    sc_codes = np.asarray(arrays.summary_codes)
    s_min = np.asarray(arrays.summary_min, np.float32)
    s_quant = np.asarray(arrays.summary_quant, np.float32)
    nbp, S = sc_comps.shape
    tiles = np.zeros((nbp, V), np.uint8)
    scale = np.zeros(nbp, np.float32)
    for s in range(0, nbp, chunk):
        e = min(nbp, s + chunk)
        cc = sc_comps[s:e]
        mask = cc != _PAD
        vv = np.where(
            mask,
            s_min[s:e, None] + sc_codes[s:e].astype(np.float32)
            * s_quant[s:e, None],
            0.0,
        )
        cols = np.where(mask, cc % V, 0).astype(np.int64)
        r = np.repeat(np.arange(e - s, dtype=np.int64), S)
        H = np.bincount(
            r * V + cols.reshape(-1), weights=vv.reshape(-1),
            minlength=(e - s) * V,
        ).reshape(e - s, V).astype(np.float32)
        mx = H.max(axis=1)
        rs = np.maximum(mx, 1e-20) / 255.0
        tiles[s:e] = np.round(H / rs[:, None]).astype(np.uint8)
        scale[s:e] = np.where(mx > 0, rs, 0.0)
    return _dc_replace_block_view(arrays, tiles, scale,
                                  pack_bins=pack_bins)


def _dc_replace_block_view(arrays, tiles, scale, pack_bins: bool = False):
    import dataclasses as _dc

    return _dc.replace(
        arrays,
        doc_tiles=tiles,
        doc_tile_scale=scale,
        list_post_start=np.asarray(arrays.list_block_start, np.int32),
        list_len=np.asarray(arrays.list_n_blocks, np.int32),
        max_list_len=int(arrays.max_blocks_per_list),
        pack_bins=pack_bins,
    )
