"""Probe which Pallas/Mosaic primitives work (and how fast) on this TPU.

Tests, each in isolation with try/except so one failure doesn't stop the
rest:
  1. element gather from a VMEM-resident table via jnp.take inside a kernel
  2. per-row async DMA gather loop (HBM -> VMEM), double-buffered
  3. compare-intersection scoring kernel throughput (VPU)
  4. dense u8 tile matmul with fused dequant

Usage: python -m seismic_tpu.harness.pallas_probe
"""

from __future__ import annotations

import functools
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


def probe(name):
    def deco(fn):
        def wrapper():
            try:
                fn()
            except Exception as e:
                print(f"[{name}] FAILED: {type(e).__name__}: {e}")
                if "-v" in sys.argv:
                    traceback.print_exc()
        wrapper.__name__ = fn.__name__
        return wrapper
    return deco


@probe("vmem_table_take")
def probe_vmem_take():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    DIM = 30720  # multiple of 128
    N = 8192  # indices per call

    def kernel(table_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        out_ref[:] = jnp.take(table_ref[:], idx.reshape(-1), axis=0).reshape(
            idx.shape
        )

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=DIM).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, DIM, size=(64, 128), dtype=np.int32))
    out = run(table, idx)
    expect = np.asarray(table)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), expect)
    t = timeit(run, table, idx)
    print(f"[vmem_table_take] ok={ok} {t*1e6:.1f} us for {idx.size} elems "
          f"({t/idx.size*1e9:.1f} ns/elem)")


@probe("vmem_table_take_2d")
def probe_vmem_take_2d():
    """Gather rows of a [DIM/128, 128]-shaped table via sublane indexing."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = 256, 128

    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:].reshape(-1), axis=0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((idx.size, C), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, R, size=(8, 128), dtype=np.int32))
    out = run(table, idx)
    expect = np.asarray(table)[np.asarray(idx).reshape(-1)]
    ok = np.allclose(np.asarray(out), expect)
    print(f"[vmem_table_take_2d] ok={ok}")


@probe("row_dma_gather")
def probe_row_dma():
    """Gather N random 1KB rows HBM->VMEM with a pipelined DMA loop."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N_DOCS, W = 1_000_000, 256
    N_ROWS = 4096  # rows gathered per call
    BUF = 8  # outstanding DMAs

    def kernel(idx_ref, hbm_ref, out_ref, scratch, sems):
        def get_dma(slot, r):
            return pltpu.make_async_copy(
                hbm_ref.at[idx_ref[r]], scratch.at[slot], sems.at[slot]
            )

        for i in range(BUF):
            get_dma(i, i).start()

        def body(r, _):
            slot = r % BUF
            get_dma(slot, r).wait()
            out_ref[r] = scratch[slot]

            @pl.when(r + BUF < N_ROWS)
            def _():
                get_dma(slot, r + BUF).start()

            return 0

        jax.lax.fori_loop(0, N_ROWS, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BUF, W), jnp.float32),
            pltpu.SemaphoreType.DMA((BUF,)),
        ],
    )

    @jax.jit
    def run(idx, hbm):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((N_ROWS, W), jnp.float32),
        )(idx, hbm)

    rng = np.random.default_rng(0)
    hbm = jnp.asarray(rng.normal(size=(N_DOCS, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N_DOCS, size=N_ROWS, dtype=np.int32))
    out = run(idx, hbm)
    expect = np.asarray(hbm)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), expect)
    t = timeit(run, idx, hbm)
    bw = N_ROWS * W * 4 / t / 1e9
    print(f"[row_dma_gather] ok={ok} {t*1e3:.2f} ms for {N_ROWS} 1KB rows "
          f"({t/N_ROWS*1e9:.0f} ns/row, {bw:.1f} GB/s)")


@probe("compare_intersect_kernel")
def probe_compare():
    """Score [T, W] doc tiles against a [Q]-term query by equality match."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, W, Q = 1024, 256, 64

    def kernel(comps_ref, vals_ref, qc_ref, qv_ref, out_ref):
        qc = qc_ref[:].reshape(1, 1, Q)
        qv = qv_ref[:].reshape(1, 1, Q)
        eq = comps_ref[:][:, :, None] == qc
        qmatch = jnp.sum(jnp.where(eq, qv, 0.0), axis=-1)
        out_ref[:] = jnp.sum(vals_ref[:] * qmatch, axis=-1, keepdims=True)

    @jax.jit
    def run(comps, vals, qc, qv):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(comps, vals, qc, qv)

    rng = np.random.default_rng(0)
    comps = jnp.asarray(rng.integers(0, 3000, size=(T, W), dtype=np.int32))
    vals = jnp.asarray(rng.normal(size=(T, W)).astype(np.float32))
    qc = jnp.asarray(rng.integers(0, 3000, size=Q, dtype=np.int32))
    qv = jnp.asarray(rng.normal(size=Q).astype(np.float32))
    out = np.asarray(run(comps, vals, qc, qv)).ravel()
    qd = np.zeros(3000, np.float32)
    np.add.at(qd, np.asarray(qc), np.asarray(qv))
    expect = (np.asarray(vals) * qd[np.asarray(comps)]).sum(-1)
    ok = np.allclose(out, expect, atol=1e-3)
    t = timeit(run, comps, vals, qc, qv)
    ops = T * W * Q
    print(f"[compare_intersect_kernel] ok={ok} {t*1e6:.1f} us "
          f"({ops/t/1e12:.2f} Tops/s)")


@probe("u8_tile_matmul")
def probe_u8_matmul():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = 512, 512

    def kernel(tile_ref, q_ref, scale_ref, out_ref):
        t = tile_ref[:].astype(jnp.float32)
        out_ref[:] = (
            jnp.dot(t, q_ref[:], preferred_element_type=jnp.float32)
            * scale_ref[:]
        )

    @jax.jit
    def run(tile, q, scale):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tile, q, scale)

    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, 255, size=(M, K), dtype=np.uint8))
    q = jnp.asarray(rng.normal(size=(K, 1)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(M, 1)).astype(np.float32))
    out = np.asarray(run(tile, q, scale))
    expect = (
        np.asarray(tile).astype(np.float32) @ np.asarray(q)
    ) * np.asarray(scale)
    ok = np.allclose(out, expect, rtol=1e-4)
    t = timeit(run, tile, q, scale)
    print(f"[u8_tile_matmul] ok={ok} {t*1e6:.1f} us")


def main(argv=None):
    import jax

    print(f"device: {jax.devices()[0]}")
    probe_vmem_take()
    probe_vmem_take_2d()
    probe_row_dma()
    probe_compare()
    probe_u8_matmul()
    return 0


if __name__ == "__main__":
    sys.exit(main())
