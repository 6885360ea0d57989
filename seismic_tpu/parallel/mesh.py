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


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-host (multi-process) JAX if configured.

    Reads explicit arguments first, then the standard environment variables
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``, or cluster auto-detection inside
    ``jax.distributed.initialize``). Returns True when running
    multi-process, False for the ordinary single-process case.

    On TPU pods the query batch fans out over DCN to every host and the
    per-host mesh slice answers over its local chips (SURVEY.md §2.7 last
    row: the reference has no distribution layer; this is the TPU-native
    equivalent).
    """
    import os

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ
        else None
    )
    pid = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ
        else None
    )
    if addr is None and nproc is None:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=nproc,
        process_id=pid,
    )
    return jax.process_count() > 1


def make_mesh_global(
    n_docs_shards: int | None = None, n_data: int = 1
) -> Mesh:
    """Build a (data, docs) mesh over ALL processes' devices (multi-host).

    Must be called after ``init_distributed``; every process must call it
    with the same arguments (SPMD single-program contract). The "docs" axis
    is laid out so consecutive shards land on one host's devices first —
    the all-gather merge then rides ICI within a host and crosses DCN only
    once per host group.
    """
    devices = jax.devices()  # global, ordered by (process, local id)
    if n_docs_shards is None:
        n_docs_shards = len(devices) // n_data
    n = n_data * n_docs_shards
    if n > len(devices):
        raise ValueError(
            f"global mesh ({n_data} x {n_docs_shards}) needs {n} devices, "
            f"only {len(devices)} across {jax.process_count()} processes"
        )
    # [data, docs] with docs contiguous per process: device list is already
    # process-major, so a plain reshape keeps each host's devices adjacent
    # along the docs axis.
    grid = np.asarray(devices[:n]).reshape(n_data, n_docs_shards)
    return Mesh(grid, axis_names=("data", "docs"))
