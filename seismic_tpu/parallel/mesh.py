"""Device mesh helpers.

The engine scales over two mesh axes (SURVEY.md §2.7, §5):

- ``"data"``  — query-batch data parallelism (the reference's inter-query
  rayon fan-out, src/pylib/mod.rs:629-652);
- ``"docs"``  — document-axis sharding of the index (no reference
  equivalent: the reference is single-node shared-memory). Each chip holds
  an independent index over its document shard; results merge with one
  all-gather of [n_chips, k] candidates + a final top-k, which rides ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_docs_shards: int | None = None, n_data: int = 1) -> Mesh:
    """Build a (data, docs) mesh over the available devices."""
    devices = jax.devices()
    if n_docs_shards is None:
        n_docs_shards = len(devices) // n_data
    n = n_data * n_docs_shards
    if n > len(devices):
        raise ValueError(
            f"mesh ({n_data} x {n_docs_shards}) needs {n} devices, "
            f"only {len(devices)} available"
        )
    grid = np.asarray(devices[:n]).reshape(n_data, n_docs_shards)
    return Mesh(grid, axis_names=("data", "docs"))
