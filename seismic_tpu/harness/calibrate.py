"""Bench calibration: sweep index knobs at small scale to pick the
recall/QPS operating points for the headline benchmark.

Usage: python -m seismic_tpu.harness.calibrate [n_docs]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..build.builder import build_index
    from ..config import Configuration, GlobalThresholdPruning, TpuLayout
    from ..harness.synth import synth_dataset, synth_queries
    from ..search.engine import SearchParams, pad_queries, search_batch_jit
    from ..search.exact import exact_search

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    dim = 30522
    B = 256
    t = time.time()
    ds = synth_dataset(n_docs, dim=dim, seed=7)
    qc, qv = synth_queries(B, dim=dim, seed=11)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    print(f"data: {time.time()-t:.0f}s nnz/doc={ds.nnz/len(ds):.0f}",
          file=sys.stderr)
    t = time.time()
    _, gt = exact_search(ds, q_comps, q_vals, k=10, chunk=2048)
    print(f"GT: {time.time()-t:.0f}s", file=sys.stderr)

    def recall(ids):
        hits = tot = 0
        for r, g in zip(ids, gt):
            hits += len({int(x) for x in r[:10] if x >= 0}
                        & {int(x) for x in g[:10] if x >= 0})
            tot += 10
        return hits / tot

    qcd = jnp.asarray(q_comps, jnp.int32)
    qvd = jnp.asarray(q_vals, jnp.float32)

    for n_post, v_cap, ovf in [(200, 512, 32), (200, 1024, 32)]:
        cfg = Configuration(
            pruning=GlobalThresholdPruning(n_postings=n_post,
                                           max_fraction=2.0),
            layout=TpuLayout(max_block_len=32, summary_vocab_cap=v_cap,
                             max_doc_nnz=256, tile_overflow=ovf),
        )
        t = time.time()
        arrays = build_index(ds, cfg)
        build_s = time.time() - t
        index = arrays.to_device()
        mem = arrays.space_usage_report()["total"] / 1e9
        for qcut in (10, 20):
            params = SearchParams(k=10, query_cut=qcut, doc_mode="tiles",
                                  full_lists=True, dedup_pool=128)
            s, i = search_batch_jit(index, qcd, qvd, jnp.float32(0.0),
                                    params, 128, 42)
            r = recall(np.asarray(i))
            # steady-state timing
            for _ in range(2):
                s, i = search_batch_jit(index, qcd, qvd, jnp.float32(0.0),
                                        params, 128, 42)
            np.asarray(s).ravel()[:1]
            t0 = time.time()
            for _ in range(5):
                s, i = search_batch_jit(index, qcd, qvd, jnp.float32(0.0),
                                        params, 128, 42)
            np.asarray(s).ravel()[:1]
            dt = (time.time() - t0) / 5
            print(f"np={n_post} V={v_cap} O={ovf} qc={qcut}: "
                  f"recall={r:.4f} {dt/B*1e6:.0f}us/q "
                  f"({B/dt:.0f} QPS) mem={mem:.2f}GB build={build_s:.0f}s")
        # also the exact gather ceiling for this build
        params = SearchParams(k=10, query_cut=20, block_budget=0,
                              doc_mode="gather")
        s, i = search_batch_jit(index, qcd, qvd, jnp.float32(0.0), params,
                                128, 42)
        print(f"  gather ceiling qc=20: {recall(np.asarray(i)):.4f}")
        del index
        import gc; gc.collect()
    return 0


if __name__ == "__main__":
    sys.exit(main())
