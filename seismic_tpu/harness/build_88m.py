"""Build the 8.8M-doc scale rung collection + memory-lean index.

The reference demonstrates accuracy@10 = 0.99 on 8.8M-doc MS MARCO with
per-list n_postings 3000-4000 (reference docs/Guidelines.md:41-67,
experiments/best_configs/msmarco-v2 configs). This script builds the
synthetic equivalent for the TPU block-summary configuration:

- `synth_dataset_fast` 8.8M docs (cached npz under .bench_cache/);
- index with NO per-posting doc tiles (store_doc_tiles=False) and a u8
  compressed forward index (value_dtype="u8", the DotVByte-equivalent) —
  the on-device state for the block-pool search is forward + postings +
  block geometry + hashed [n_blocks, V] block summaries
  (ops/pallas_tiles.py::block_pool_arrays), which FITS one v5e chip at
  8.8M docs where per-posting tiles (~50-90 GB) cannot;
- 2048 synthetic queries (ground truth is computed separately on the TPU
  via search/exact.py — the 1-core host would take hours).

Stages are cached; rerunning resumes after the last completed stage.
Run: python -m seismic_tpu.harness.build_88m [n_postings]
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
CACHE = os.path.join(ROOT, ".bench_cache")

N_DOCS = int(os.environ.get("B88_N_DOCS", 8_800_000))
DIM = 30522
N_QUERIES = 2048
N_POSTINGS = int(
    sys.argv[1] if len(sys.argv) > 1
    else os.environ.get("B88_N_POSTINGS", 3500)
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_dataset():
    from ..data.sparse import CsrDataset
    from .synth import synth_dataset_fast

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"docs88_{N_DOCS}_{DIM}.npz")
    if os.path.exists(path):
        t = time.time()
        with np.load(path) as z:
            ds = CsrDataset(z["offsets"], z["components"], z["values"],
                            DIM)
        log(f"dataset loaded: {time.time()-t:.0f}s nnz={ds.nnz:,}")
        return ds
    t = time.time()
    ds = synth_dataset_fast(N_DOCS, dim=DIM, seed=88, progress=True)
    log(f"synth_fast: {time.time()-t:.0f}s nnz={ds.nnz:,}")
    np.savez(path, offsets=ds.offsets, components=ds.components,
             values=ds.values)
    return ds


def main():
    t_all = time.time()
    base = os.path.join(CACHE, f"index88_{N_DOCS}_{DIM}_{N_POSTINGS}")
    dirpath = base + ".dir"
    if os.path.isdir(dirpath):
        log(f"index already built: {dirpath}")
        return

    ds = get_dataset()

    from ..build.builder import build_index
    from ..config import Configuration, GlobalThresholdPruning, TpuLayout

    cfg = Configuration(
        pruning=GlobalThresholdPruning(n_postings=N_POSTINGS,
                                       max_fraction=2.0),
        layout=TpuLayout(
            max_block_len=32,
            max_summary_nnz=128,
            # DENSE summaries on (probe_r3p: dense block tiles pool at
            # exact-summary quality; hashed rows lose 3-7 points); no
            # doc tiles / overflow / sketches — the block-pool path
            # reads dense_summary + forward only
            summary_vocab_cap=512,
            tile_overflow=0,
            sketch_dim=0,
            max_doc_nnz=192,
        ),
    )
    t = time.time()
    arrays = build_index(
        ds, cfg, value_dtype="u8", store_summaries=True,
        store_sketches=False, store_doc_tiles=False, progress=True,
    )
    build_secs = time.time() - t
    log(f"index build: {build_secs:.0f}s")
    arrays.save_dir(dirpath)
    with open(base + ".buildtime.json", "w") as f:
        json.dump({"build_secs": build_secs,
                   "n_postings": N_POSTINGS}, f)

    # queries (same protocol as bench.py, distinct seeds per 1024)
    from ..search.engine import pad_queries
    from .synth import synth_queries

    qpath = os.path.join(CACHE, f"queries88_{DIM}_{N_QUERIES}.npz")
    if not os.path.exists(qpath):
        parts = []
        seed = 881
        remaining = N_QUERIES
        while remaining > 0:
            n = min(1024, remaining)
            qc1, qv1 = synth_queries(n, dim=DIM, seed=seed)
            parts.append(pad_queries(qc1, qv1, 64))
            remaining -= n
            seed += 1
        np.savez(qpath,
                 q_comps=np.concatenate([p[0] for p in parts]),
                 q_vals=np.concatenate([p[1] for p in parts]))
        log(f"queries saved: {qpath}")
    log(f"total: {time.time()-t_all:.0f}s")


if __name__ == "__main__":
    main()
