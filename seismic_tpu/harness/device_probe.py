"""Device probe tool: which Pallas/Mosaic and XLA primitives work on this
TPU, and how fast. Consolidates the three round-1 probe generations
(pallas_probe{,2,3}) into one tool; each probe runs isolated with
try/except so one failure doesn't stop the rest.

Findings these probes established (baked into the production kernels):
- element gathers (jnp.take in-kernel and XLA-level) are ~1000x slower per
  byte than contiguous DMA streams on this device -> the engine streams
  tiles, never gathers rows on the hot path;
- data-dependent BlockSpec index_maps (PrefetchScalarGridSpec) stream
  scattered-but-aligned tiles at full DMA speed -> basis of
  ops/pallas_tiles.py and ops/pallas_grouped.py;
- Mosaic block shapes must be (8, 128)-divisible in the trailing dims
  (int8: (32, 128)); u8->f32 casts are unsupported in-kernel, int8 views
  with a +256 fixup are;
- compare-intersection scoring (the qloc projection) runs at Tcmp/s on the
  VPU, fast enough to replace dense-query gathers.

Usage: python -m seismic_tpu.harness.device_probe [--only NAME] [-v]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

import numpy as np

PROBES = []


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

    wrapper.__name__ = fn.__name__
    PROBES.append(wrapper)
    return wrapper


# ---------------------------------------------------------------------------
# Generation 1: primitive feasibility
# ---------------------------------------------------------------------------


@probe
def vmem_table_take():
    """Element gather from a VMEM-resident 1D table inside a kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    DIM = 30720

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
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
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


@probe
def row_dma_gather():
    """Gather N random 1KB rows HBM->VMEM with a pipelined DMA loop."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N_DOCS, W = 1_000_000, 256
    N_ROWS = 4096
    BUF = 8

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


@probe
def compare_intersect_kernel():
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


@probe
def u8_tile_matmul():
    """Dense u8 tile mat-vec with fused scale (needs uint8 VMEM support)."""
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


# ---------------------------------------------------------------------------
# Generation 2: fixes for generation-1 failures
# ---------------------------------------------------------------------------


@probe
def take_along_axis_sublane():
    """Per-lane sublane gather inside a kernel."""
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
    """1D HBM row DMA at dynamic (unaligned) offsets."""
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
    """Compare-intersection with a fori_loop over terms (no register
    blowup)."""
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
    """int8 -> f32 cast feeding the MXU in-kernel."""
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


# ---------------------------------------------------------------------------
# Generation 3: the streaming-dense search design's primitives
# ---------------------------------------------------------------------------

_B, _QC, _MB, _V = 256, 10, 32, 512
_NB = 200_000


@probe
def xla_slice_matmul():
    """XLA vmap dynamic_slice + tiny matmul (the non-Pallas tile scorer)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    dense = jnp.asarray(
        rng.integers(0, 127, size=(_NB, _V), dtype=np.int8)
    )
    lbs = jnp.asarray(
        rng.integers(0, _NB - _MB, size=(_B, _QC), dtype=np.int32)
    )
    qloc = jnp.asarray(
        rng.normal(size=(_B, _QC, _V)).astype(np.float32)
    )

    @jax.jit
    def run(dense, lbs, qloc):
        def one(s, q):
            tile = jax.lax.dynamic_slice(dense, (s, 0), (_MB, _V))
            return jnp.dot(tile.astype(jnp.float32), q,
                           preferred_element_type=jnp.float32)

        return jax.vmap(jax.vmap(one))(lbs, qloc)

    t = timeit(run, dense, lbs, qloc)
    n_slices = _B * _QC
    bytes_ = n_slices * _MB * _V
    print(f"[xla_slice_matmul] {t*1e3:.2f} ms for {n_slices} "
          f"[{_MB},{_V}]u8 slices+matmul ({t/n_slices*1e6:.1f} us/slice, "
          f"{bytes_/t/1e9:.2f} GB/s)")


@probe
def xla_compare_qloc():
    """Compare-based query projection qloc (gather-free) throughput."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    vocab = jnp.asarray(
        rng.integers(0, 30522, size=(_B, _QC, _V), dtype=np.int32)
    )
    qc = jnp.asarray(rng.integers(0, 30522, size=(_B, 64), dtype=np.int32))
    qv = jnp.asarray(rng.normal(size=(_B, 64)).astype(np.float32))

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
    """Data-dependent BlockSpec streaming: the production kernel pattern."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    n_tiles = _NB // _MB
    dense = jnp.asarray(
        rng.integers(0, 127, size=(n_tiles * _MB, _V), dtype=np.int8)
    )
    tile_idx = jnp.asarray(
        rng.integers(0, n_tiles, size=(_B * _QC,), dtype=np.int32)
    )
    qloc = jnp.asarray(
        rng.normal(size=(_B * _QC, _V)).astype(np.float32)
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
        grid=(_B * _QC,),
        in_specs=[
            pl.BlockSpec((_MB, _V), lambda i, tidx: (tidx[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _V), lambda i, tidx: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _MB), lambda i, tidx: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(tile_idx, dense, qloc):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((_B * _QC, _MB), jnp.float32),
        )(tile_idx, dense, qloc)

    out = np.asarray(run(tile_idx, dense, qloc))
    d = np.asarray(dense).astype(np.float32)
    q = np.asarray(qloc)
    ti = np.asarray(tile_idx)
    expect = np.stack(
        [d[ti[i] * _MB:(ti[i] + 1) * _MB] @ q[i] for i in range(8)]
    )
    ok = np.allclose(out[:8], expect, rtol=1e-4)
    t = timeit(run, tile_idx, dense, qloc)
    n_slices = _B * _QC
    bytes_ = n_slices * _MB * _V
    print(f"[pallas_pipelined_blocks] ok={ok} {t*1e3:.2f} ms for "
          f"{n_slices} tiles ({t/n_slices*1e6:.2f} us/tile, "
          f"{bytes_/t/1e9:.2f} GB/s)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="substring filter on probe names")
    ap.add_argument("-v", action="store_true")
    args, _ = ap.parse_known_args(argv)

    import jax

    print(f"device: {jax.devices()[0]}")
    for p in PROBES:
        if args.only and args.only not in p.__name__:
            continue
        p()
    return 0


if __name__ == "__main__":
    sys.exit(main())
