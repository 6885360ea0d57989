"""Host-side preparation for the Pallas tile scorer (thin indirection to
avoid a types <-> ops import cycle)."""

import json
import os

import numpy as np

from .ops.pallas_tiles import SUB, pallas_align_doc_tiles


def ll_pad_for(max_list_len: int, csub: int = 1) -> int:
    unit = SUB * csub
    return ((max(max_list_len, 1) + unit - 1) // unit) * unit


def prepare_pallas_tiles(arrays, csub: int = 1):
    return pallas_align_doc_tiles(
        arrays, ll_pad_for(arrays.max_list_len, csub), csub
    )


def _dir_fingerprint(index_dir: str) -> int:
    """Newest mtime over the dir's files (the dir's own mtime only moves
    on entry add/remove, not content rewrites)."""
    return int(max(
        os.path.getmtime(os.path.join(index_dir, f))
        for f in os.listdir(index_dir)
    ) * 1e6)


def load_or_build_aligned(arrays, index_dir: str, csub: int = 1):
    """`prepare_pallas_tiles`, cached mmap-able on disk next to the
    index's `.dir`.

    The aligned-layout gather is a random-order fancy-index copy over the
    full doc-tile pool — ~25-30 single-core minutes at the 1M W=1024 shape
    (~19 GB), paid by EVERY process that uploads the index (round-5
    lesson: OOM isolation forces fresh processes per measurement family,
    so the tax repeats). The cache pays the gather once and every later
    load mmaps the finished layout (sequential read, ~1-2 min).

    Keyed on (source-dir newest-file mtime, csub, tile pool shape): a
    rebuilt index invalidates the cache (advisor r4 on the blockview
    cache: path alone silently reuses stale derived views).

    Returns (tiles_i8, scale3d, region_start, row_off) — the `_aligned`
    tuple `IndexArrays.to_device` accepts.
    """
    d = index_dir.rstrip("/")
    if d.endswith(".dir"):
        d = d[:-4]
    d += f".aligned_c{csub}.dir"
    meta_p = os.path.join(d, "meta.json")
    fp = {
        "src_fp": _dir_fingerprint(index_dir),
        "csub": int(csub),
        "rows": int(arrays.doc_tiles.shape[0]),
        "v": int(arrays.doc_tiles.shape[1]),
        "pack_bins": bool(getattr(arrays, "pack_bins", False)),
    }
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            meta = json.load(f)
        if meta.get("fp") == fp:
            tiles = np.load(os.path.join(d, "tiles.npy"), mmap_mode="r")
            scale3d = np.load(os.path.join(d, "scale3d.npy"),
                              mmap_mode="r")
            region_start = np.load(os.path.join(d, "region_start.npy"))
            ro_p = os.path.join(d, "row_off.npy")
            row_off = np.load(ro_p) if os.path.exists(ro_p) else None
            return tiles, scale3d, region_start, row_off
    tiles, scale3d, region_start, row_off = prepare_pallas_tiles(
        arrays, csub
    )
    os.makedirs(d, exist_ok=True)
    np.save(os.path.join(d, "tiles.npy"), tiles)
    np.save(os.path.join(d, "scale3d.npy"), scale3d)
    np.save(os.path.join(d, "region_start.npy"), region_start)
    if row_off is not None:
        np.save(os.path.join(d, "row_off.npy"), row_off)
    elif os.path.exists(os.path.join(d, "row_off.npy")):
        os.remove(os.path.join(d, "row_off.npy"))
    # meta written LAST: a partial cache (killed mid-save) never matches
    with open(meta_p, "w") as f:
        json.dump({"fp": fp}, f)
    return tiles, scale3d, region_start, row_off
