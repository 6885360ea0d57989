"""The device-side index representation.

Everything the jitted search program touches is a fixed-shape dense array in
this dataclass. This is the TPU-native re-design of the reference's pointer
structures (reference: src/inverted_index.rs:38-52, src/posting_list.rs:69-73,
src/quantized_summary.rs:15-24):

- forward index          -> padded CSR tiles  [n_docs, doc_width]
- posting lists + blocks -> one flat posting array, blocks as (start, len)
                            windows, a list's blocks stored contiguously
- quantized summaries    -> padded per-block CSR tiles of u8 codes with
                            per-block (min, quant) dequant params (exact
                            path), plus int8 CountSketch rows (fast path)
- k-NN graph             -> dense [n_docs, nknn] int32

All ids are int32; component u16/u32 width is an API-level capacity check
only (TPU vectors are int32 either way; SURVEY.md §7 step 6).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .config import Configuration
from .data.sparse import PAD_COMPONENT

INDEX_SUFFIX = ".index.seismic_tpu"
KNN_SUFFIX = ".knn.seismic_tpu"

# Version for the on-disk format.
FORMAT_VERSION = 1


@dataclass
class IndexArrays:
    """Host (NumPy) mirror of the device index. `to_device()` uploads."""

    # --- forward index tiles ---
    fwd_comps: np.ndarray  # int32 [n_docs, W], PAD_COMPONENT padded, sorted
    fwd_vals: np.ndarray  # f32/f16/bf16 [n_docs, W] (or u8 codes, see scale)
    # u8 value compression (DotVByte-equivalent, SURVEY §2.3): when set,
    # true value = fwd_vals * fwd_val_step[doc] + fwd_val_min[doc].
    fwd_val_min: Optional[np.ndarray] = None  # f32 [n_docs]
    fwd_val_step: Optional[np.ndarray] = None  # f32 [n_docs]

    # --- posting lists / blocks ---
    postings: np.ndarray = None  # int32 [total_postings_pad] doc ids
    block_start: np.ndarray = None  # int32 [n_blocks_pad] into postings
    block_len: np.ndarray = None  # int32 [n_blocks_pad] (<= max_block_len)
    list_block_start: np.ndarray = None  # int32 [n_lists] into blocks
    list_n_blocks: np.ndarray = None  # int32 [n_lists]

    # --- block summaries: exact u8-quantized CSR tiles ---
    summary_comps: np.ndarray = None  # int32 [n_blocks_pad, S] PAD padded
    summary_codes: np.ndarray = None  # uint8 [n_blocks_pad, S]
    summary_min: np.ndarray = None  # f32 [n_blocks_pad]
    summary_quant: np.ndarray = None  # f32 [n_blocks_pad]

    # --- block summaries: per-list local-vocab dense u8 matrix (the MXU
    # block-ranking fast path; no reference equivalent — replaces the
    # sparse-merge of quantized_summary.rs:64-160 with a matmul) ---
    list_vocab: Optional[np.ndarray] = None  # int32 [n_lists, V] PAD padded
    dense_summary: Optional[np.ndarray] = None  # uint8 [n_blocks_pad, V]
    dense_scale: Optional[np.ndarray] = None  # f32 [n_blocks_pad]

    # --- replicated block-aligned dense doc tiles (streaming doc scorer;
    # no reference equivalent — trades memory for contiguous access so doc
    # scoring is dynamic-slice + MXU instead of random row gathers) ---
    doc_tiles: Optional[np.ndarray] = None  # uint8 [total_postings_pad, V]
    doc_tile_scale: Optional[np.ndarray] = None  # f32 [total_postings_pad]
    list_post_start: Optional[np.ndarray] = None  # int32 [n_lists]
    list_len: Optional[np.ndarray] = None  # int32 [n_lists]
    # local (within-list) block index of each posting occurrence
    posting_block_local: Optional[np.ndarray] = None  # int32 [total_postings_pad]
    # per-posting out-of-vocab overflow entries (top-O components of the doc
    # that fall outside the list vocab; recovers the dot-product mass the
    # dense tile truncates)
    tile_ovf_comps: Optional[np.ndarray] = None  # int32 [total_postings_pad, O]
    tile_ovf_vals: Optional[np.ndarray] = None  # f16 [total_postings_pad, O]
    # local-vocab importance metadata (consumed by
    # ops/pallas_tiles.py::narrow_vocab to derive narrower-width tile
    # sets without rebuilding): vocab_rank[l, j] = importance rank of
    # list_vocab[l, j] within its list (0 = largest summed doc value;
    # 32767 = PAD); vocab_csum[l, i] = coverage of the list's total term
    # mass by its top-GRID[i] terms (grid: build.builder.VOCAB_CSUM_GRID)
    vocab_rank: Optional[np.ndarray] = None  # int16 [n_lists, V]
    vocab_csum: Optional[np.ndarray] = None  # f32 [n_lists, len(grid)]

    # --- block summaries: int8 sketch (experimental ranking mode) ---
    block_sketch: Optional[np.ndarray] = None  # int8 [n_blocks_pad, ds]
    block_sketch_scale: Optional[np.ndarray] = None  # f32 [n_blocks_pad]

    # --- per-document sketches (coarse candidate scoring) ---
    doc_sketch: Optional[np.ndarray] = None  # int8 [n_docs, ds]
    doc_sketch_scale: Optional[np.ndarray] = None  # f32 [n_docs]

    # --- optional k-NN graph ---
    knn: Optional[np.ndarray] = None  # int32 [n_docs, nknn]

    # --- metadata ---
    dim: int = 0
    n_docs: int = 0
    max_blocks_per_list: int = 0
    max_block_len: int = 0
    max_list_len: int = 0
    # nnz of the SOURCE dataset (before any max_doc_nnz truncation of the
    # padded forward tiles); 0 = unknown (pre-v2 index files)
    dataset_nnz: int = 0
    # bin-pack tiny list regions in the aligned device layout
    # (ops/pallas_tiles.py::packed_region_layout) — set on block views,
    # whose ~12-row lists would otherwise pad to csub*128 rows each.
    # In-memory only (views are rebuilt from the base index, not saved).
    pack_bins: bool = False
    config: Optional[Configuration] = None

    # ------------------------------------------------------------------
    @property
    def n_lists(self) -> int:
        return len(self.list_block_start)

    @property
    def nknn(self) -> int:
        return 0 if self.knn is None else self.knn.shape[1]

    def space_usage_report(self) -> dict:
        """Per-structure byte accounting, mirroring the reference SpaceUsage
        breakdown (reference: src/inverted_index.rs:102-149)."""

        def nb(a):
            return 0 if a is None else int(a.nbytes)

        forward = (
            nb(self.fwd_comps)
            + nb(self.fwd_vals)
            + nb(self.fwd_val_min)
            + nb(self.fwd_val_step)
        )
        postings = nb(self.postings) + nb(self.block_start) + nb(self.block_len)
        offsets = nb(self.list_block_start) + nb(self.list_n_blocks)
        summaries = (
            nb(self.summary_comps)
            + nb(self.summary_codes)
            + nb(self.summary_min)
            + nb(self.summary_quant)
            + nb(self.list_vocab)
            + nb(self.dense_summary)
            + nb(self.dense_scale)
            + nb(self.block_sketch)
            + nb(self.block_sketch_scale)
            + nb(self.vocab_rank)
            + nb(self.vocab_csum)
        )
        doc_tiles = (
            nb(self.doc_tiles)
            + nb(self.doc_tile_scale)
            + nb(self.list_post_start)
            + nb(self.list_len)
            + nb(self.posting_block_local)
            + nb(self.tile_ovf_comps)
            + nb(self.tile_ovf_vals)
        )
        sketches = nb(self.doc_sketch) + nb(self.doc_sketch_scale)
        knn = nb(self.knn)
        total = (
            forward + postings + offsets + summaries + sketches + knn
            + doc_tiles
        )
        return {
            "forward_index": forward,
            "packed_postings": postings,
            "block_offsets": offsets,
            "summaries": summaries,
            "doc_tiles": doc_tiles,
            "doc_sketches": sketches,
            "knn": knn,
            "total": total,
        }

    def print_space_usage_byte(self) -> int:
        rep = self.space_usage_report()
        print("Space Usage:")
        print(f"\tForward Index: {rep['forward_index']} Bytes")
        plt = rep["packed_postings"] + rep["block_offsets"] + rep["summaries"]
        print(f"\tPosting Lists: {plt} Bytes")
        print(f"\t  packed_postings: {rep['packed_postings']} Bytes")
        print(f"\t  block_offsets: {rep['block_offsets']} Bytes")
        print(f"\t  summaries: {rep['summaries']} Bytes")
        print(f"\tDoc tiles: {rep['doc_tiles']} Bytes")
        print(f"\tDoc sketches: {rep['doc_sketches']} Bytes")
        print(f"\tKnn: {rep['knn']} Bytes")
        print(f"\tTotal: {rep['total']} Bytes")
        return rep["total"]

    # ------------------------------------------------------------- save/load
    _ARRAY_FIELDS = (
        "fwd_comps",
        "fwd_vals",
        "fwd_val_min",
        "fwd_val_step",
        "postings",
        "block_start",
        "block_len",
        "list_block_start",
        "list_n_blocks",
        "summary_comps",
        "summary_codes",
        "summary_min",
        "summary_quant",
        "list_vocab",
        "dense_summary",
        "dense_scale",
        "doc_tiles",
        "doc_tile_scale",
        "list_post_start",
        "list_len",
        "posting_block_local",
        "tile_ovf_comps",
        "tile_ovf_vals",
        "vocab_rank",
        "vocab_csum",
        "block_sketch",
        "block_sketch_scale",
        "doc_sketch",
        "doc_sketch_scale",
        "knn",
    )

    def save(self, path: str) -> str:
        """Persist to `<path>.index.seismic_tpu` (npz + embedded metadata).

        Preserves the reference's "build once, query many" workflow
        (reference: IndexSerializer, src/inverted_index.rs:54-59).
        """
        if not path.endswith(INDEX_SUFFIX):
            path = path + INDEX_SUFFIX
        arrays = {}
        for f in self._ARRAY_FIELDS:
            a = getattr(self, f)
            if a is not None:
                arrays[f] = self._to_savable(a)
        arrays["__meta__"] = np.frombuffer(
            json.dumps(self._meta_dict()).encode("utf-8"), dtype=np.uint8
        )
        np.savez(path, **arrays)
        # np.savez appends .npz; normalize to the exact requested path.
        if os.path.exists(path + ".npz"):
            os.replace(path + ".npz", path)
        return path

    @staticmethod
    def _to_savable(a: np.ndarray) -> np.ndarray:
        # np.savez cannot store bfloat16; round-trip through float32.
        if a.dtype.name == "bfloat16":
            return np.asarray(a, dtype=np.float32)
        return a

    def _meta_dict(self) -> dict:
        return {
            "version": FORMAT_VERSION,
            "dim": self.dim,
            "n_docs": self.n_docs,
            "max_blocks_per_list": self.max_blocks_per_list,
            "max_block_len": self.max_block_len,
            "max_list_len": self.max_list_len,
            "dataset_nnz": self.dataset_nnz,
            "config": self.config.to_dict() if self.config else None,
        }

    @staticmethod
    def _from_meta(meta: dict, kwargs: dict) -> "IndexArrays":
        cfg = (
            Configuration.from_dict(meta["config"]) if meta["config"] else None
        )
        return IndexArrays(
            dim=meta["dim"],
            n_docs=meta["n_docs"],
            max_blocks_per_list=meta["max_blocks_per_list"],
            max_block_len=meta["max_block_len"],
            max_list_len=meta.get("max_list_len", 0),
            dataset_nnz=meta.get("dataset_nnz", 0),
            config=cfg,
            **kwargs,
        )

    def save_dir(self, path: str) -> str:
        """Persist as a DIRECTORY of raw .npy files + meta.json. Unlike the
        single-file npz (which streams through the zip layer on load),
        this form memory-maps on load — multi-GB indexes open in
        milliseconds and pages fault in on demand (the HBM upload then
        reads them once, sequentially).

        Writes into `<path>.tmp` then renames, so an interrupted save
        (watchdog/OOM kill mid-np.save) never leaves a half-written
        directory that load_dir would try to open."""
        import shutil

        tmp = path.rstrip("/") + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        for f in self._ARRAY_FIELDS:
            a = getattr(self, f)
            if a is not None:
                np.save(os.path.join(tmp, f + ".npy"), self._to_savable(a))
        with open(os.path.join(tmp, "meta.json"), "w") as fp:
            json.dump(self._meta_dict(), fp)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        return path

    @staticmethod
    def load_dir(path: str, mmap: bool = True) -> "IndexArrays":
        with open(os.path.join(path, "meta.json")) as fp:
            meta = json.load(fp)
        kwargs = {}
        for f in IndexArrays._ARRAY_FIELDS:
            p = os.path.join(path, f + ".npy")
            kwargs[f] = (
                np.load(p, mmap_mode="r" if mmap else None)
                if os.path.exists(p)
                else None
            )
        return IndexArrays._from_meta(meta, kwargs)

    @staticmethod
    def load(path: str) -> "IndexArrays":
        if os.path.isdir(path):
            return IndexArrays.load_dir(path)
        if not path.endswith(INDEX_SUFFIX) and os.path.exists(path + INDEX_SUFFIX):
            path = path + INDEX_SUFFIX
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
            kwargs = {}
            for f in IndexArrays._ARRAY_FIELDS:
                kwargs[f] = z[f] if f in z.files else None
        return IndexArrays._from_meta(meta, kwargs)

    # ------------------------------------------------------------- device
    def to_device(self, device=None, pallas_tiles: bool = False,
                  tile_csub: int = 1, super_summaries: bool = False,
                  _aligned=None,
                  vocab_residue: int = 0,
                  tile_hash: int = 0,
                  lean_fwd: bool = False,
                  fwd_f16: bool = False):
        """Upload all arrays to a device, returning a DeviceIndex pytree.

        With pallas_tiles=True (and doc tiles present) additionally builds
        the SUB-aligned tile layout consumed by the Pallas fused scorer
        (SearchParams.use_pallas). tile_csub > 1 packs csub consecutive
        subtiles per work item ([csub*128, V] DMAs — fewer, larger grid
        steps for the grouped scorer; grouped-path only). `_aligned`
        supplies precomputed (tiles_i8, scale3d, region_start) — used by
        the sharded path, which pads the aligned layouts to common shapes
        across shards before upload."""
        import jax
        import jax.numpy as jnp

        if vocab_residue and getattr(self, "vocab_residue", 0) == 0:
            # reorder list vocabularies (and tile columns) into static
            # residue groups for the bucketed qloc kernel; upload-time
            # only — the on-disk index stays residue-free
            from .ops.pallas_tiles import residue_permute_arrays

            return residue_permute_arrays(self, vocab_residue).to_device(
                device, pallas_tiles, tile_csub, super_summaries,
                _aligned,
            )

        def put(a):
            if a is None:
                return None
            return jax.device_put(jnp.asarray(a), device)

        extra = {}
        # narrowing metadata is host-side (narrow_vocab consumes it at
        # derive time); never spend HBM on it
        skip = {"vocab_rank", "vocab_csum"}
        fuse_fwd = (pallas_tiles and self.fwd_comps is not None
                    and self.fwd_val_min is None)
        if tile_hash:
            assert self.doc_tiles is not None and (
                self.doc_tiles.shape[1] == tile_hash
            ), "tile_hash requires hash_retile'd doc tiles of that width"
        if pallas_tiles and self.dim <= 32766:
            # int16 twins of the gather-heavy id arrays (PAD -> -1): the
            # grouped path's vocab + forward-row gathers run at ~25 GB/s
            # effective on this device, so halving their bytes halves two
            # of the three dominant tail stages (round-3 profile_r3).
            # (hashed tiles never read the vocab: skip its device twin)
            if self.list_vocab is not None and not tile_hash:
                lv = np.asarray(self.list_vocab)
                extra["vocab16"] = put(
                    np.where(lv == PAD_COMPONENT, -1, lv).astype(np.int16)
                )
            if self.fwd_comps is not None and not fuse_fwd:
                fc = np.asarray(self.fwd_comps)
                extra["fwd_comps16"] = put(
                    np.where(fc == PAD_COMPONENT, -1, fc).astype(np.int16)
                )
                if lean_fwd:
                    # the grouped + rescore path reads only the i16 twin;
                    # skipping the i32 original saves 4 bytes/slot of HBM
                    # (8.8M-doc rung: ~6.8 GB). Engine-path consumers of
                    # fwd_comps are NOT served by a lean index.
                    skip |= {"fwd_comps"}
        if fuse_fwd:
            fc = np.asarray(self.fwd_comps, dtype=np.int32)
            fv = np.asarray(self.fwd_vals, dtype=np.float32)
            if fwd_f16 and self.dim <= 32766:
                # HALF-width fused forward tile: each slot packs
                # (comp int16 << 16) | f16-bit value into ONE int32 word,
                # so the [n_docs, W] array is HALF the [n_docs, 2W] fused
                # tile's bytes. Two wins at the 1M W=1024 operating point
                # (the index is 14.93 GB of a 16 GB chip, round 5): ~1 GB
                # of HBM back, and the rescore gather's [B*R, W] HLO temp
                # halves — deep-rescore programs stopped compiling there
                # (remote-compile HTTP 500) because that temp outgrew the
                # scratch headroom. Values round f32 -> f16 (~5e-4 rel),
                # the reference's own headline forward-index precision
                # (src/pylib/mod.rs:27-28 stores f16). Pad slots decode to
                # comp=-1 (arithmetic shift) / value=+0.0.
                comp16 = np.where(fc == PAD_COMPONENT, -1, fc).astype(
                    np.int16
                )
                val16 = fv.astype(np.float16)
                val16[comp16 < 0] = np.float16(0.0)
                extra["fwd_fused16"] = put(
                    (comp16.astype(np.int32) << 16)
                    | val16.view(np.uint16).astype(np.int32)
                )
            else:
                # fused forward tile: comps and f32-bit values interleaved
                # in ONE [n_docs, 2W] int32 array. The rescore gather is
                # bound by gathered-ROW count (~50 ns/row on this device,
                # byte width immaterial: f16 values measured no faster),
                # so one fused gather halves the dominant rescore cost
                # (probe_r3b).
                extra["fwd_fused"] = put(
                    np.concatenate([fc, fv.view(np.int32)], axis=1)
                )
            # the fused layout SUPERSEDES fwd_comps/fwd_vals/fwd_comps16
            # on device (all row-gather consumers read it), saving 10-12
            # bytes/slot of HBM
            skip |= {"fwd_comps", "fwd_vals"}
        if (self.doc_tile_scale is not None
                and self.list_post_start is not None):
            # per-list max posting value (u8 code 255 * row scale): the
            # weighted-cut list selection ranks lists by
            # query_value * list_weight instead of value alone
            lw = _list_weights(
                np.asarray(self.doc_tile_scale),
                np.asarray(self.list_post_start),
                np.asarray(self.list_len),
            )
            extra["list_weight"] = put(lw)
        overrides = {}
        if pallas_tiles and (self.doc_tiles is not None
                             or _aligned is not None):
            row_off = None
            if _aligned is not None:
                tiles_i8, scale3d, region_start = _aligned[:3]
                if len(_aligned) > 3:
                    row_off = _aligned[3]
            else:
                from .ops_pallas_prep import prepare_pallas_tiles

                tiles_i8, scale3d, region_start, row_off = (
                    prepare_pallas_tiles(self, tile_csub)
                )
            extra.update(
                doc_tiles_aligned=put(tiles_i8),
                tile_scale3d=put(scale3d),
                list_region_start=put(region_start),
            )
            if row_off is not None:
                # bin-packed regions: serve EFFECTIVE list geometry so
                # every planner works unchanged — list_len := row_off +
                # len (the kernel-window row bound), list_post_start :=
                # start - row_off (posting = pstart + window_row). The
                # raw row_off array drives the grouped path's lower-
                # bound masks (bin-mates' rows are garbage there).
                ll = np.asarray(self.list_len, np.int32)
                ps = np.asarray(self.list_post_start, np.int32)
                extra["list_row_off"] = put(row_off)
                overrides["list_len"] = put(row_off + ll)
                overrides["list_post_start"] = put(ps - row_off)
            if super_summaries:
                from .ops.pallas_tiles import super_tile_summaries

                # bin-packed views interleave bin-mates' rows inside one
                # region, so a super-tile max would mix different lists'
                # postings — garbage upper bounds (advisor r4; only the
                # search-time stream_frac assert would catch it later)
                assert row_off is None, (
                    "super_summaries=True is unsupported on bin-packed "
                    "(pack_bins) views: super-tile bounds would mix "
                    "bin-mates' rows"
                )
                sc, ss = super_tile_summaries(tiles_i8, scale3d, tile_csub)
                extra["super_summary"] = put(sc)
                extra["super_scale"] = put(ss)
            # the packed tiles are superseded on device; keep HBM for the
            # aligned layout
            skip |= {"doc_tiles", "doc_tile_scale"}
        fields = {
            f: (None if f in skip else put(getattr(self, f)))
            for f in self._ARRAY_FIELDS
        }
        fields.update(overrides)
        return DeviceIndex(
            **fields,
            **extra,
            dim=self.dim,
            n_docs=self.n_docs,
            max_blocks_per_list=self.max_blocks_per_list,
            max_block_len=self.max_block_len,
            max_list_len=self.max_list_len,
            tile_csub=tile_csub if pallas_tiles else 1,
            vocab_residue=getattr(self, "vocab_residue", 0),
            tile_hash=tile_hash,
        )


@dataclass
class DeviceIndex:
    """Device-resident pytree of index arrays (leaves are jnp arrays).

    Static metadata lives in aux fields so jit treats it as compile-time
    constants.
    """

    fwd_comps: object
    fwd_vals: object
    fwd_val_min: object
    fwd_val_step: object
    postings: object
    block_start: object
    block_len: object
    list_block_start: object
    list_n_blocks: object
    summary_comps: object
    summary_codes: object
    summary_min: object
    summary_quant: object
    list_vocab: object
    dense_summary: object
    dense_scale: object
    doc_tiles: object
    doc_tile_scale: object
    list_post_start: object
    list_len: object
    posting_block_local: object
    tile_ovf_comps: object
    tile_ovf_vals: object
    block_sketch: object
    block_sketch_scale: object
    doc_sketch: object
    doc_sketch_scale: object
    knn: object
    # device-only Pallas tile layout (built by to_device(pallas_tiles=True))
    doc_tiles_aligned: object = None
    tile_scale3d: object = None
    list_region_start: object = None
    # per-super-tile upper-bound summaries (streaming-budget mode)
    super_summary: object = None
    super_scale: object = None
    # int16 twins (PAD -> -1) of list_vocab / fwd_comps for the grouped
    # path's bandwidth-bound gathers (present when dim <= 32766)
    vocab16: object = None
    fwd_comps16: object = None
    # per-list max posting value (weighted-cut list selection)
    list_weight: object = None
    # bin-packed aligned regions (pack_bins views): row offset of each
    # list inside its region; list_len/list_post_start are then served
    # EFFECTIVE (len+off / start-off) so planners need no changes, and
    # the grouped regroup masks rows < row_off (bin-mates' garbage)
    list_row_off: object = None
    # fused [n_docs, 2W] int32 forward tile (comps | f32-bit values): the
    # rescore gather is bound by gathered-row COUNT on this device, so one
    # fused gather replaces the separate comps+vals gathers (probe_r3b)
    fwd_fused: object = None
    # half-width fused forward tile [n_docs, W] int32: (comp i16 << 16) |
    # f16-bit value per slot (to_device(fwd_f16=True)); halves forward
    # HBM and the rescore gather's temps at ~5e-4 relative value rounding
    fwd_fused16: object = None
    # vocab-rank metadata mirrors (host-side only; kept off device —
    # narrow_vocab consumes them at derive time)
    vocab_rank: object = None
    vocab_csum: object = None
    dim: int = 0
    n_docs: int = 0
    max_blocks_per_list: int = 0
    max_block_len: int = 0
    max_list_len: int = 0
    # subtiles per grouped-scorer work item (aligned-layout granularity)
    tile_csub: int = 1
    # list vocabularies are residue-R ordered (R static groups of V/R
    # slots; ops/pallas_tiles.py::residue_permute_arrays) — enables the
    # bucketed qloc kernel. 0 = plain importance order.
    vocab_residue: int = 0
    # doc tiles are HASHED (column = comp mod tile_hash, collisions
    # summed; ops/pallas_tiles.py::hash_retile). The grouped path then
    # hashes the QUERY once per query instead of projecting it per
    # (query, list) pair. 0 = truncated local-vocab tiles.
    tile_hash: int = 0


def _list_weights(doc_tile_scale, list_post_start, list_len):
    """f32 [n_lists]: max posting value per list (code 255 * row scale).
    The packed tile layout stores non-empty lists contiguously, so one
    np.maximum.reduceat over their starts covers each list's rows (the
    final segment extends into the zero tail, which cannot raise a max)."""
    n_lists = len(list_post_start)
    w = np.zeros(n_lists, np.float32)
    starts = list_post_start.astype(np.int64)
    nz_idx = np.flatnonzero(list_len > 0)
    if len(nz_idx):
        red = np.maximum.reduceat(doc_tile_scale, starts[nz_idx])
        w[nz_idx] = red * 255.0
    return w


def _register_device_index():
    import jax

    array_fields = [
        f.name
        for f in dataclasses.fields(DeviceIndex)
        if f.name
        not in ("dim", "n_docs", "max_blocks_per_list", "max_block_len",
                "max_list_len", "tile_csub", "vocab_residue", "tile_hash")
    ]

    def flatten(d: DeviceIndex):
        children = tuple(getattr(d, f) for f in array_fields)
        aux = (d.dim, d.n_docs, d.max_blocks_per_list, d.max_block_len,
               d.max_list_len, d.tile_csub, d.vocab_residue, d.tile_hash)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(array_fields, children))
        return DeviceIndex(
            **kwargs,
            dim=aux[0],
            n_docs=aux[1],
            max_blocks_per_list=aux[2],
            max_block_len=aux[3],
            max_list_len=aux[4],
            tile_csub=aux[5],
            vocab_residue=aux[6],
            tile_hash=aux[7],
        )

    jax.tree_util.register_pytree_node(DeviceIndex, flatten, unflatten)


_register_device_index()

__all__ = [
    "IndexArrays",
    "DeviceIndex",
    "PAD_COMPONENT",
    "INDEX_SUFFIX",
    "KNN_SUFFIX",
]
