"""Microbenchmarks of the access patterns the engine is built from.

Measures, on the actual device: random row gathers at several widths,
element gathers from a table, batched dynamic slices, scatter-add
densification, compare-intersection scoring, and big matmuls. These numbers
drive kernel design decisions (which stage needs Pallas, which layout wins).

Usage: python -m seismic_tpu.harness.microbench
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _sync(x):
    np.asarray(x).ravel()[:1]


def timeit(fn, *args, reps=10):
    import jax

    f = jax.jit(fn)
    _sync(f(*args))
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = f(*args)
    _sync(out)
    return (time.time() - t0) / reps


def main(argv=None):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    results = {}

    N_DOCS = 1_000_000
    table_i32 = jnp.asarray(
        rng.integers(0, 30522, size=(N_DOCS, 256), dtype=np.int32)
    )
    table_f32 = jnp.asarray(rng.normal(size=(N_DOCS, 256)).astype(np.float32))
    table_128 = jnp.asarray(
        rng.integers(-127, 127, size=(N_DOCS, 128), dtype=np.int8)
    )

    # ---- random row gathers ----
    for n_rows in (262_144,):
        idx = jnp.asarray(
            rng.integers(0, N_DOCS, size=n_rows, dtype=np.int32)
        )
        for name, tab in (("f32x256(1KB)", table_f32),
                          ("i32x256(1KB)", table_i32),
                          ("i8x128(128B)", table_128)):
            t = timeit(lambda i, tb: tb[i], idx, tab)
            bytes_moved = n_rows * tab.shape[1] * tab.dtype.itemsize
            print(f"row_gather {name} n={n_rows}: {t*1e3:8.2f} ms "
                  f"{bytes_moved/t/1e9:7.2f} GB/s {t/n_rows*1e9:7.1f} ns/row")

    # ---- element gather from a small table (the qd lookup) ----
    qd = jnp.asarray(rng.normal(size=30523).astype(np.float32))
    for n_el in (1_048_576,):
        eidx = jnp.asarray(
            rng.integers(0, 30523, size=n_el, dtype=np.int32)
        )
        t = timeit(lambda i, q: q[i], eidx, qd)
        print(f"elem_gather [30523]f32 n={n_el}: {t*1e3:8.2f} ms "
              f"{t/n_el*1e9:7.2f} ns/elem")

    # ---- element gather batched per-row (vmap take, the real pattern) ----
    B = 256
    qd_b = jnp.asarray(rng.normal(size=(B, 30523)).astype(np.float32))
    idx_b = jnp.asarray(
        rng.integers(0, 30523, size=(B, 4096), dtype=np.int32)
    )
    t = timeit(
        lambda q, i: jax.vmap(lambda qr, ir: jnp.take(qr, ir, axis=0))(q, i),
        qd_b, idx_b,
    )
    n = B * 4096
    print(f"vmap_elem_gather [B,30523] n={n}: {t*1e3:8.2f} ms "
          f"{t/n*1e9:7.2f} ns/elem")

    # ---- one-hot matmul alternative to element gather ----
    # score-by-compare: comps [B, C, W] vs query terms [B, Q]
    comps = jnp.asarray(
        rng.integers(0, 30522, size=(64, 1024, 256), dtype=np.int32)
    )
    qc = jnp.asarray(rng.integers(0, 30522, size=(64, 64), dtype=np.int32))
    qv = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))

    def compare_score(comps, qc, qv):
        eq = comps[..., None] == qc[:, None, None, :]
        return jnp.sum(
            jnp.sum(eq.astype(jnp.float32) * qv[:, None, None, :], -1), -1
        )

    t = timeit(compare_score, comps, qc, qv)
    ops = comps.size * qc.shape[1]
    print(f"compare_intersect {comps.shape}x{qc.shape[1]}: {t*1e3:8.2f} ms "
          f"{ops/t/1e12:6.2f} Tops/s")

    # ---- batched dynamic slices (candidate windows) ----
    postings = jnp.asarray(
        rng.integers(0, N_DOCS, size=16_777_216, dtype=np.int32)
    )
    starts = jnp.asarray(
        rng.integers(0, 16_777_216 - 64, size=(256, 256), dtype=np.int32)
    )

    def windows(p, s):
        return jax.vmap(jax.vmap(
            lambda st: jax.lax.dynamic_slice(p, (st,), (32,))
        ))(s)

    t = timeit(windows, postings, starts)
    n = starts.size
    print(f"dyn_slice_windows 32xi32 n={n}: {t*1e3:8.2f} ms "
          f"{t/n*1e9:7.1f} ns/slice")

    # ---- scatter-add densify (query table build) ----
    qcm = jnp.asarray(rng.integers(0, 30522, size=(256, 64), dtype=np.int32))
    qvl = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32))

    def densify(qcm, qvl):
        qd = jnp.zeros((256, 30523), jnp.float32)
        rows = jnp.broadcast_to(jnp.arange(256)[:, None], qcm.shape)
        return qd.at[rows, qcm].add(qvl)

    t = timeit(densify, qcm, qvl)
    print(f"scatter_densify [256,30523]: {t*1e3:8.2f} ms")

    # one-hot matmul densify alternative
    def densify_onehot(qcm, qvl):
        # [B, Q] -> [B, dim] via segment matmul in chunks over dim
        oh = jax.nn.one_hot(qcm, 30523, dtype=jnp.float32)  # [B,Q,dim]
        return jnp.einsum("bq,bqd->bd", qvl, oh)

    t = timeit(densify_onehot, qcm, qvl)
    print(f"onehot_densify [256,30523]: {t*1e3:8.2f} ms")

    # ---- reference matmul peaks ----
    a = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    bm = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    t = timeit(lambda x, y: x @ y, a, bm)
    print(f"matmul f32 4Kx4Kx4K: {t*1e3:8.2f} ms "
          f"{2*4096**3/t/1e12:6.1f} TFLOP/s")
    ab = a.astype(jnp.bfloat16)
    bb = bm.astype(jnp.bfloat16)
    t = timeit(
        lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32),
        ab, bb,
    )
    print(f"matmul bf16 4Kx4Kx4K: {t*1e3:8.2f} ms "
          f"{2*4096**3/t/1e12:6.1f} TFLOP/s")

    # ---- streaming read bandwidth ----
    big = jnp.asarray(rng.normal(size=(512, 1024, 256)).astype(np.float32))
    t = timeit(lambda x: jnp.sum(x, axis=(1, 2)), big)
    print(f"stream_reduce 512MB: {t*1e3:8.2f} ms "
          f"{big.nbytes/t/1e9:7.1f} GB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
