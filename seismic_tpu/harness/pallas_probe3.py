"""Probe 3: the primitives of the streaming-dense search design.

  1. XLA vmap dynamic_slice [MB, 512] u8 + tiny matmul (current stage-2
     pattern) in isolation — how much is slice overhead?
  2. compare-based query projection qloc (gather-free) throughput
  3. Pallas pipelined data-dependent block fetch: PrefetchScalarGridSpec
     with index_map reading prefetched block indices (the Mosaic way to
     stream scattered-but-aligned tiles at full DMA speed)
  4. the same with a fused u8->f32 MXU matmul per tile

Usage: python -m seismic_tpu.harness.pallas_probe3
"""

from __future__ import annotations

import sys
import time
import traceback

import numpy as np


def _sync(x):
    np.asarray(x).ravel()[:1]


def timeit(f, *args, reps=5):
    _sync(f(*args))
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = f(*args)
    _sync(out)
    return (time.time() - t0) / reps


def probe(fn):
    def wrapper():
        try:
            fn()
        except Exception as e:
            print(f"[{fn.__name__}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            if "-v" in sys.argv:
                traceback.print_exc()
    return wrapper


B, QC, MB, V = 256, 10, 32, 512
NB = 200_000  # total block rows


@probe
def xla_slice_matmul():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    dense = jnp.asarray(
        rng.integers(0, 127, size=(NB, V), dtype=np.int8)
    )
    lbs = jnp.asarray(
        rng.integers(0, NB - MB, size=(B, QC), dtype=np.int32)
    )
    qloc = jnp.asarray(
        rng.normal(size=(B, QC, V)).astype(np.float32)
    )

    @jax.jit
    def run(dense, lbs, qloc):
        def one(s, q):
            tile = jax.lax.dynamic_slice(dense, (s, 0), (MB, V))
            return jnp.dot(tile.astype(jnp.float32), q,
                           preferred_element_type=jnp.float32)

        return jax.vmap(jax.vmap(one))(lbs, qloc)

    t = timeit(run, dense, lbs, qloc)
    n_slices = B * QC
    bytes_ = n_slices * MB * V
    print(f"[xla_slice_matmul] {t*1e3:.2f} ms for {n_slices} [{MB},{V}]u8 "
          f"slices+matmul ({t/n_slices*1e6:.1f} us/slice, "
          f"{bytes_/t/1e9:.2f} GB/s)")


@probe
def xla_compare_qloc():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    vocab = jnp.asarray(
        rng.integers(0, 30522, size=(B, QC, V), dtype=np.int32)
    )
    qc = jnp.asarray(rng.integers(0, 30522, size=(B, 64), dtype=np.int32))
    qv = jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32))

    @jax.jit
    def run(vocab, qc, qv):
        eq = vocab[..., None] == qc[:, None, None, :]
        return jnp.sum(
            jnp.where(eq, qv[:, None, None, :], 0.0), axis=-1
        )

    t = timeit(run, vocab, qc, qv)
    ops = vocab.size * 64
    print(f"[xla_compare_qloc] {t*1e3:.2f} ms ({ops/t/1e12:.3f} Tcmp/s) "
          f"for qloc [B,QC,V]")


@probe
def pallas_pipelined_blocks():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    n_tiles = NB // MB
    dense = jnp.asarray(
        rng.integers(0, 127, size=(n_tiles * MB, V), dtype=np.int8)
    )
    tile_idx = jnp.asarray(
        rng.integers(0, n_tiles, size=(B * QC,), dtype=np.int32)
    )
    qloc = jnp.asarray(
        rng.normal(size=(B * QC, V)).astype(np.float32)
    )

    def kernel(tidx_ref, tile_ref, qloc_ref, out_ref):
        t = tile_ref[:].astype(jnp.float32)
        out_ref[:] = jax.lax.dot_general(
            t, qloc_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * QC,),
        in_specs=[
            pl.BlockSpec((MB, V), lambda i, tidx: (tidx[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V), lambda i, tidx: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, MB), lambda i, tidx: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(tile_idx, dense, qloc):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B * QC, MB), jnp.float32),
        )(tile_idx, dense, qloc)

    out = np.asarray(run(tile_idx, dense, qloc))
    d = np.asarray(dense).astype(np.float32)
    q = np.asarray(qloc)
    ti = np.asarray(tile_idx)
    expect = np.stack(
        [d[ti[i] * MB:(ti[i] + 1) * MB] @ q[i] for i in range(8)]
    )
    ok = np.allclose(out[:8], expect, rtol=1e-4)
    t = timeit(run, tile_idx, dense, qloc)
    n_slices = B * QC
    bytes_ = n_slices * MB * V
    print(f"[pallas_pipelined_blocks] ok={ok} {t*1e3:.2f} ms for "
          f"{n_slices} tiles ({t/n_slices*1e6:.2f} us/tile, "
          f"{bytes_/t/1e9:.2f} GB/s)")


@probe
def pallas_compare_unrolled():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, W, Q = 512, 128, 64

    def kernel(comps_ref, vals_ref, qc_ref, qv_ref, out_ref):
        comps = comps_ref[:]
        qmatch = jnp.zeros((T, W), jnp.float32)
        for i in range(Q):  # unrolled
            qmatch = qmatch + jnp.where(
                comps == qc_ref[0, i], qv_ref[0, i], 0.0
            )
        out_ref[:] = jnp.sum(vals_ref[:] * qmatch, axis=-1, keepdims=True)

    @jax.jit
    def run(comps, vals, qc, qv):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(comps, vals, qc, qv)

    rng = np.random.default_rng(0)
    comps = jnp.asarray(rng.integers(0, 3000, size=(T, W), dtype=np.int32))
    vals = jnp.asarray(rng.normal(size=(T, W)).astype(np.float32))
    qc = jnp.asarray(rng.integers(0, 3000, size=(1, Q), dtype=np.int32))
    qv = jnp.asarray(rng.normal(size=(1, Q)).astype(np.float32))
    out = np.asarray(run(comps, vals, qc, qv)).ravel()
    qd = np.zeros(3000, np.float32)
    np.add.at(qd, np.asarray(qc).ravel(), np.asarray(qv).ravel())
    expect = (np.asarray(vals) * qd[np.asarray(comps)]).sum(-1)
    ok = np.allclose(out, expect, atol=1e-3)
    t = timeit(run, comps, vals, qc, qv)
    print(f"[pallas_compare_unrolled] ok={ok} {t*1e6:.1f} us for "
          f"{T}x{W}x{Q} ({T*W*Q/t/1e9:.1f} Gcmp/s)")


def main(argv=None):
    import jax

    print(f"device: {jax.devices()[0]}")
    xla_slice_matmul()
    xla_compare_qloc()
    pallas_pipelined_blocks()
    pallas_compare_unrolled()
    return 0


if __name__ == "__main__":
    sys.exit(main())
