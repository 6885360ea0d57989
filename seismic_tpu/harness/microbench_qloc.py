"""Device microbenchmarks for the grouped path's VPU-bound stages:

1. qloc projection variants (the [B, QC, V] x [B, sc] compare-accumulate):
   - einsum-f32 (round-2 baseline; materializes eq as f32 [B,QC,V,sc])
   - einsum-bf16 (halves the eq materialization traffic)
   - scan-chunk (sequential accumulation, no eq materialization)
2. ovf-correction variants (same structure on [B, pool, O] x [B, sc])
3. in-kernel int8 x int8 -> int32 MXU matmul feasibility + rate
   (vs the current i8 -> f32/bf16 cast + fixup path)

Usage: python -m seismic_tpu.harness.microbench_qloc
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _sync(x):
    np.asarray(x).ravel()[:1]


def timeit(f, *args, reps=10):
    out = f(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    _sync(out)
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)

    B, QC, V, SC = 1024, 11, 1024, 64
    vocab = jnp.asarray(
        rng.integers(0, 30522, (B, QC, V), dtype=np.int32)
    )
    top_c = jnp.asarray(rng.integers(0, 30522, (B, SC), dtype=np.int32))
    top_v = jnp.asarray(rng.random((B, SC), np.float32))

    @jax.jit
    def qloc_einsum_f32(vocab, tc, tv):
        eq = (vocab[..., None] == tc[:, None, None, :]).astype(jnp.float32)
        return jnp.einsum("bqvi,bi->bqv", eq, tv,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def qloc_einsum_bf16(vocab, tc, tv):
        eq = (vocab[..., None] == tc[:, None, None, :]).astype(jnp.bfloat16)
        return jnp.einsum("bqvi,bi->bqv", eq, tv.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def make_scan(chunk):
        @jax.jit
        def qloc_scan(vocab, tc, tv):
            n = SC // chunk
            tc_ = tc.reshape(B, n, chunk)
            tv_ = tv.reshape(B, n, chunk)

            def step(acc, i):
                c = jax.lax.dynamic_index_in_dim(tc_, i, 1, False)  # [B, ch]
                v = jax.lax.dynamic_index_in_dim(tv_, i, 1, False)
                hit = (
                    vocab[..., None] == c[:, None, None, :]
                )  # [B,QC,V,ch]
                acc = acc + jnp.sum(
                    jnp.where(hit, v[:, None, None, :], 0.0), axis=-1
                )
                return acc, None

            acc = jnp.zeros((B, QC, V), jnp.float32)
            acc, _ = jax.lax.scan(step, acc, jnp.arange(n))
            return acc

        return qloc_scan

    ref = np.asarray(qloc_einsum_f32(vocab, top_c, top_v))
    for name, fn in [
        ("einsum_f32", qloc_einsum_f32),
        ("einsum_bf16", qloc_einsum_bf16),
        ("scan_ch4", make_scan(4)),
        ("scan_ch8", make_scan(8)),
        ("scan_ch16", make_scan(16)),
    ]:
        try:
            out = np.asarray(fn(vocab, top_c, top_v))
            err = float(np.abs(out - ref).max())
            t = timeit(fn, vocab, top_c, top_v)
            print(f"qloc {name:>12}: {t*1e3:7.2f} ms  maxerr={err:.4f}")
        except Exception as e:
            print(f"qloc {name:>12}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")

    # ---- ovf variants ----
    POOL, O = 128, 64
    oc = jnp.asarray(rng.integers(0, 30522, (B, POOL, O), dtype=np.int32))
    ov = jnp.asarray(rng.random((B, POOL, O), np.float32))

    @jax.jit
    def ovf_einsum_f32(oc, ov, tc, tv):
        eq = oc[..., None] == tc[:, None, None, :]
        qmatch = jnp.einsum("bpos,bs->bpo", eq.astype(jnp.float32), tv,
                            preferred_element_type=jnp.float32)
        return jnp.sum(qmatch * ov, axis=-1)

    @jax.jit
    def ovf_einsum_bf16(oc, ov, tc, tv):
        eq = oc[..., None] == tc[:, None, None, :]
        qmatch = jnp.einsum("bpos,bs->bpo", eq.astype(jnp.bfloat16),
                            tv.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        return jnp.sum(qmatch * ov, axis=-1)

    def make_ovf_scan(chunk):
        @jax.jit
        def ovf_scan(oc, ov, tc, tv):
            n = SC // chunk
            tc_ = tc.reshape(B, n, chunk)
            tv_ = tv.reshape(B, n, chunk)

            def step(acc, i):
                c = jax.lax.dynamic_index_in_dim(tc_, i, 1, False)
                v = jax.lax.dynamic_index_in_dim(tv_, i, 1, False)
                hit = oc[..., None] == c[:, None, None, :]  # [B,P,O,ch]
                acc = acc + jnp.sum(
                    jnp.where(hit, v[:, None, None, :], 0.0), axis=-1
                )
                return acc, None

            acc = jnp.zeros((B, POOL, O), jnp.float32)
            acc, _ = jax.lax.scan(step, acc, jnp.arange(n))
            return jnp.sum(acc * ov, axis=-1)

        return ovf_scan

    ref = np.asarray(ovf_einsum_f32(oc, ov, top_c, top_v))
    for name, fn in [
        ("einsum_f32", ovf_einsum_f32),
        ("einsum_bf16", ovf_einsum_bf16),
        ("scan_ch8", make_ovf_scan(8)),
        ("scan_ch16", make_ovf_scan(16)),
    ]:
        try:
            out = np.asarray(fn(oc, ov, top_c, top_v))
            err = float(np.abs(out - ref).max())
            t = timeit(fn, oc, ov, top_c, top_v)
            print(f"ovf  {name:>12}: {t*1e3:7.2f} ms  maxerr={err:.4f}")
        except Exception as e:
            print(f"ovf  {name:>12}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")

    # ---- in-kernel int8 matmul probes ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K, N = 8, 1024, 128
    tile = jnp.asarray(rng.integers(-128, 128, (N, K), dtype=np.int8))
    q_i8 = jnp.asarray(rng.integers(-128, 128, (M, K), dtype=np.int8))
    q_f32 = jnp.asarray(rng.random((M, K), np.float32))

    def run_kernel(kernel, out_dtype, *ops):
        @jax.jit
        def go(*args):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
                * len(args),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*args)

        return go

    def k_i8i8(q_ref, t_ref, out_ref):
        import jax.numpy as jnp

        out_ref[:] = jax.lax.dot_general(
            q_ref[:], t_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def k_bf16(q_ref, t_ref, out_ref):
        import jax.numpy as jnp

        t = t_ref[:].astype(jnp.bfloat16)
        q = q_ref[:].astype(jnp.bfloat16)
        out_ref[:] = jax.lax.dot_general(
            q, t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    try:
        go = run_kernel(k_i8i8, jnp.int32, q_i8, tile)
        out = np.asarray(go(q_i8, tile))
        exp = np.asarray(q_i8).astype(np.int64) @ np.asarray(tile).T.astype(
            np.int64
        )
        ok = np.array_equal(out.astype(np.int64), exp)
        t = timeit(go, q_i8, tile)
        print(f"kernel i8xi8->i32 [{M},{K}]x[{N},{K}]: ok={ok} "
              f"{t*1e6:.1f} us")
    except Exception as e:
        print(f"kernel i8xi8: FAILED {type(e).__name__}: {str(e)[:300]}")

    try:
        go = run_kernel(k_bf16, jnp.float32, q_i8, tile)
        _ = np.asarray(go(q_i8, tile))
        t = timeit(go, q_i8, tile)
        print(f"kernel i8->bf16 cast matmul: {t*1e6:.1f} us")
    except Exception as e:
        print(f"kernel i8->bf16: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
