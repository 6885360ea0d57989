"""Second round of Pallas/Mosaic probes, fixing round-1 failures:

  1. per-lane sublane gather: jnp.take_along_axis(table [R,128], idx [M,128])
  2. flat 1D HBM row DMA (128-aligned offsets)
  3. compare-intersection with a term loop (no register blowup)
  4. int8 -> f32 cast in-kernel

Usage: python -m seismic_tpu.harness.pallas_probe2
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
                  f"{str(e)[:400]}")
            if "-v" in sys.argv:
                traceback.print_exc()
    return wrapper


@probe
def take_along_axis_sublane():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C, M = 256, 128, 512

    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, R, size=(M, C), dtype=np.int32))
    out = np.asarray(run(table, idx))
    expect = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=0)
    ok = np.allclose(out, expect)
    t = timeit(run, table, idx)
    print(f"[take_along_axis_sublane] ok={ok} {t*1e6:.1f} us for "
          f"{M*C} elems ({t/(M*C)*1e9:.2f} ns/elem)")


@probe
def flat_row_dma():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N_DOCS, W = 1_000_000, 256
    N_ROWS = 4096
    BUF = 16

    def kernel(idx_ref, hbm_ref, out_ref, scratch, sems):
        def get_dma(slot, r):
            off = idx_ref[r] * W
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(off, W)],
                scratch.at[slot],
                sems.at[slot],
            )

        for i in range(BUF):
            get_dma(i, i).start()

        def body(r, _):
            slot = r % BUF
            get_dma(slot, r).wait()
            out_ref[r] = scratch[slot].reshape(W)

            @pl.when(r + BUF < N_ROWS)
            def _():
                get_dma(slot, r + BUF).start()

            return 0

        jax.lax.fori_loop(0, N_ROWS, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
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
    hbm2d = rng.normal(size=(N_DOCS, W)).astype(np.float32)
    hbm = jnp.asarray(hbm2d.reshape(-1))
    idx = jnp.asarray(rng.integers(0, N_DOCS, size=N_ROWS, dtype=np.int32))
    out = np.asarray(run(idx, hbm))
    expect = hbm2d[np.asarray(idx)]
    ok = np.allclose(out, expect)
    t = timeit(run, idx, hbm)
    bw = N_ROWS * W * 4 / t / 1e9
    print(f"[flat_row_dma] ok={ok} {t*1e3:.2f} ms for {N_ROWS} 1KB rows "
          f"({t/N_ROWS*1e9:.0f} ns/row, {bw:.1f} GB/s)")


@probe
def compare_term_loop():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, W, Q = 1024, 256, 64

    def kernel(comps_ref, vals_ref, qc_ref, qv_ref, out_ref):
        comps = comps_ref[:]
        qmatch = jnp.zeros((T, W), jnp.float32)

        def body(i, qmatch):
            qc_i = qc_ref[0, i]
            qv_i = qv_ref[0, i]
            return qmatch + jnp.where(comps == qc_i, qv_i, 0.0)

        qmatch = jax.lax.fori_loop(0, Q, body, qmatch)
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
    ops = T * W * Q
    print(f"[compare_term_loop] ok={ok} {t*1e6:.1f} us "
          f"({ops/t/1e12:.2f} Tcmp/s, {T/t/1e6:.1f} Mdocs/s/query)")


@probe
def int8_cast_matmul():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = 512, 512

    def kernel(tile_ref, q_ref, out_ref):
        t = tile_ref[:].astype(jnp.float32)
        out_ref[:] = jnp.dot(t, q_ref[:], preferred_element_type=jnp.float32)

    @jax.jit
    def run(tile, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tile, q)

    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(-127, 127, size=(M, K), dtype=np.int8))
    q = jnp.asarray(rng.normal(size=(K, 128)).astype(np.float32))
    out = np.asarray(run(tile, q))
    expect = np.asarray(tile).astype(np.float32) @ np.asarray(q)
    ok = np.allclose(out, expect, rtol=1e-3, atol=1e-2)
    t = timeit(run, tile, q)
    print(f"[int8_cast_matmul] ok={ok} {t*1e6:.1f} us")


def main(argv=None):
    import jax

    print(f"device: {jax.devices()[0]}")
    take_along_axis_sublane()
    flat_row_dma()
    compare_term_loop()
    int8_cast_matmul()
    return 0


if __name__ == "__main__":
    sys.exit(main())
