"""Round-2 device microbenchmarks: the op shapes the grouped search path
needs (row gathers for slot rearrangement, element gathers for candidate
ids, sort-based regrouping, host->device transfer of planner arrays).

Usage: python -m seismic_tpu.harness.microbench_r2
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _sync(x):
    np.asarray(x).ravel()[:1]


def timeit(fn, *args, reps=10):
    import jax

    out = fn(*args)
    _sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out if not isinstance(out, tuple) else out[0])
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)

    B, SC = 1024, 64
    NSLOT = 57344  # G_cap * M
    table = jnp.asarray(rng.random((B, SC), np.float32))
    idx = jnp.asarray(rng.integers(0, B, NSLOT, dtype=np.int32))

    f = jax.jit(lambda t, i: t[i])
    t = timeit(f, table, idx)
    mb = NSLOT * SC * 4 / 1e6
    print(f"row gather [B,{SC}] -> [{NSLOT},{SC}]: {t*1e3:.2f} ms "
          f"({mb/t/1e3:.2f} GB/s)")

    # element gather: candidate posting ids
    for n in (98_304, 917_504):
        big = jnp.asarray(rng.integers(0, 1 << 30, 4_500_000, dtype=np.int32))
        ei = jnp.asarray(rng.integers(0, 4_500_000, n, dtype=np.int32))
        f2 = jax.jit(lambda t, i: jnp.take(t, i))
        t = timeit(f2, big, ei)
        print(f"elem gather {n}: {t*1e3:.2f} ms ({n/t/1e6:.1f} M/s)")

    # row gather of medium rows: pair_slot regroup [11264 rows x 16 f32]
    src = jnp.asarray(rng.random((NSLOT, 16), np.float32))
    pi = jnp.asarray(rng.integers(0, NSLOT, 11264, dtype=np.int32))
    f3 = jax.jit(lambda t, i: t[i])
    t = timeit(f3, src, pi)
    print(f"row gather [{NSLOT},16] -> [11264,16]: {t*1e3:.2f} ms")

    # vocab row gather as in today's path: [30522,1024] i32 -> [11264,1024]
    vocab = jnp.asarray(rng.integers(0, 30522, (30522, 1024), dtype=np.int32))
    vi = jnp.asarray(rng.integers(0, 30522, 11264, dtype=np.int32))
    t = timeit(f3, vocab, vi)
    print(f"row gather [30522,1024]i32 -> [11264,1024]: {t*1e3:.2f} ms "
          f"({11264*4096/t/1e9:.1f} GB/s)")
    # grouped variant: only 7168 rows
    vi2 = jnp.asarray(rng.integers(0, 30522, 7168, dtype=np.int32))
    t = timeit(f3, vocab, vi2)
    print(f"row gather [30522,1024]i32 -> [7168,1024]: {t*1e3:.2f} ms")

    # sort-based regroup: 180K (key, val, val) sort
    n = 180_224
    keys = jnp.asarray(rng.integers(0, B, n, dtype=np.int32))
    v1 = jnp.asarray(rng.random(n, np.float32))
    v2 = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    f4 = jax.jit(lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1))
    t = timeit(f4, keys, v1, v2)
    print(f"lax.sort 180K x3: {t*1e3:.2f} ms")

    # scatter-add 11K into 11K (planner fallback if done on device)
    tgt = jnp.zeros(11264, jnp.int32)
    si = jnp.asarray(rng.integers(0, 11264, 11264, dtype=np.int32))
    f5 = jax.jit(lambda t_, i: t_.at[i].add(1))
    t = timeit(f5, tgt, si)
    print(f"scatter-add 11K: {t*1e3:.2f} ms")

    # host->device transfer rates for planner arrays
    for shape, dtype in (((7168, 8), np.int32), ((57344, 64), np.float16),
                         ((2048, 1024), np.float32)):
        a = np.ascontiguousarray(rng.random(shape).astype(dtype))
        f6 = lambda x: jnp.asarray(x)
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            _sync(jnp.asarray(a) + 0)
        t = (time.time() - t0) / reps
        mb = a.nbytes / 1e6
        print(f"h2d {shape} {np.dtype(dtype).name} ({mb:.1f} MB): "
              f"{t*1e3:.2f} ms ({mb/t/1e3:.2f} GB/s)")

    # qloc einsum at slot scale: [7168, 8, V] from vocab [7168, V] x topc [7168, 8, sc]
    G, M, V, SCc = 7168, 8, 1024, 64
    voc = jnp.asarray(rng.integers(0, 30522, (G, V), dtype=np.int32))
    tc = jnp.asarray(rng.integers(0, 30522, (G, M, SCc), dtype=np.int32))
    tv = jnp.asarray(rng.random((G, M, SCc), np.float32))

    @jax.jit
    def qloc_slot(voc, tc, tv):
        eq = (voc[:, None, :, None] == tc[:, :, None, :]).astype(jnp.float32)
        return jnp.einsum("gmvi,gmi->gmv", eq, tv,
                          preferred_element_type=jnp.float32)

    t = timeit(qloc_slot, voc, tc, tv)
    print(f"qloc einsum slot [{G},{M},{V}]x{SCc}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
