"""Built-index forward-value dtype conversion.

The reference converts a *built* index between storage types without
re-running the (expensive) pruning/clustering pipeline — fixedu8 builds
are in fact f32 builds followed by a conversion pass (reference:
src/inverted_index.rs:237-284 `ConvertFrom`,
src/bin/build_inverted_index.rs:278-286). Only the forward-index value
encoding changes; posting structures, block summaries, and doc tiles are
quantized independently at build time and carry over untouched.

TPU-first shape: the forward index here is a padded [n_docs, W] tile
pair, so conversion is two vectorized NumPy passes (decode to f32,
re-encode) — no per-posting-list walk.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..data.sparse import PAD_COMPONENT
from ..types import IndexArrays

#: storage dtypes accepted by ``convert_index`` (reference value types
#: f32 / f16 / bf16 / fixedu8 / fixedu16 map to these; the ``fixed*``
#: aliases are accepted too, matching the build CLI's flag values)
VALUE_DTYPES = ("f32", "f16", "bf16", "u8", "u16")
_ALIASES = {"fixedu8": "u8", "fixedu16": "u16"}


def decode_forward_values(arrays: IndexArrays) -> np.ndarray:
    """The forward-index values as f32 [n_docs, W] (0 at padding)."""
    vals = np.asarray(arrays.fwd_vals)
    mask = arrays.fwd_comps != PAD_COMPONENT
    if arrays.fwd_val_min is not None:
        f = (
            vals.astype(np.float32) * arrays.fwd_val_step[:, None]
            + arrays.fwd_val_min[:, None]
        )
        return np.where(mask, f, 0.0).astype(np.float32)
    return np.where(mask, vals.astype(np.float32), 0.0)


def convert_index(arrays: IndexArrays, value_dtype: str) -> IndexArrays:
    """Return a new IndexArrays with the forward values re-encoded in
    ``value_dtype``; every other structure is shared (zero-copy).

    Scalar-quantized targets (u8/u16) recompute the per-document
    (min, step) from the decoded values, so a chain of conversions only
    ever accumulates one quantization error, like the reference's
    f32 -> fixedu8 pass."""
    from .builder import _encode_values

    value_dtype = _ALIASES.get(value_dtype, value_dtype)
    if value_dtype not in VALUE_DTYPES:
        raise ValueError(
            f"unknown value_dtype {value_dtype!r}; expected one of "
            f"{VALUE_DTYPES + tuple(_ALIASES)}"
        )
    f32 = decode_forward_values(arrays)
    vals, mins, steps = _encode_values(f32, arrays.fwd_comps, value_dtype)
    return dataclasses.replace(
        arrays, fwd_vals=vals, fwd_val_min=mins, fwd_val_step=steps
    )
