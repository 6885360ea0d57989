"""Export the synthetic bench collection to the seismic inner binary
format so the shipped best-config TOMLs (experiments/best_configs_synth/)
are runnable through harness/run_experiments.py.

Writes into experiments/data_synth/ (not committed — ~170 MB):
  documents.bin, queries.bin      seismic inner format
                                  (reference: scripts/convert_json_to_inner_format.py:10-27)
  doc_ids.npy, queries_ids.npy    string id arrays
  groundtruth.tsv                 exact top-10 per query (query_id, doc_id,
                                  rank, score), the run_experiments GT format

Reuses the .bench_cache npz caches when present; otherwise synthesizes
the same collection (seeds 7 / 11+12).

Usage: python -m seismic_tpu.harness.export_synth [--out experiments/data_synth]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
CACHE = os.path.join(ROOT, ".bench_cache")

N_DOCS = 100_000
DIM = 30522
N_QUERIES = 2048


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "experiments",
                                                  "data_synth"))
    args = ap.parse_args()

    from ..data.sparse import CsrDataset
    from ..data.io import write_seismic_format
    from ..search.engine import pad_queries
    from .synth import synth_dataset, synth_queries

    os.makedirs(args.out, exist_ok=True)

    dpath = os.path.join(CACHE, f"docs_{N_DOCS}_{DIM}.npz")
    if os.path.exists(dpath):
        with np.load(dpath) as z:
            ds = CsrDataset(z["offsets"], z["components"], z["values"], DIM)
    else:
        t = time.time()
        ds = synth_dataset(N_DOCS, dim=DIM, seed=7)
        log(f"synth dataset: {time.time()-t:.0f}s")

    qc1, qv1 = synth_queries(1024, dim=DIM, seed=11)
    qc2, qv2 = synth_queries(N_QUERIES - 1024, dim=DIM, seed=12)
    q_comps_l = qc1 + qc2
    q_vals_l = qv1 + qv2
    # queries as a CSR dataset for the binary writer
    q_offsets = np.zeros(len(q_comps_l) + 1, np.int64)
    np.cumsum([len(c) for c in q_comps_l], out=q_offsets[1:])
    qds = CsrDataset(
        q_offsets,
        np.concatenate(q_comps_l).astype(np.int32),
        np.concatenate(q_vals_l).astype(np.float32),
        DIM,
    )

    write_seismic_format(ds, os.path.join(args.out, "documents.bin"))
    write_seismic_format(qds, os.path.join(args.out, "queries.bin"))
    np.save(os.path.join(args.out, "doc_ids.npy"),
            np.array([str(i) for i in range(len(ds))], dtype="U30"))
    np.save(os.path.join(args.out, "queries_ids.npy"),
            np.array([str(i) for i in range(len(q_comps_l))], dtype="U30"))
    log("binary data written")

    gt_path = os.path.join(CACHE, f"gt_{N_DOCS}_{DIM}_{N_QUERIES}.npz")
    if os.path.exists(gt_path):
        with np.load(gt_path) as z:
            gt_ids = z["ids"]
        gt_scores = None
    else:
        from ..search.exact import exact_search

        q_comps, q_vals = pad_queries(q_comps_l, q_vals_l, 64)
        t = time.time()
        gt_scores, gt_ids = exact_search(ds, q_comps, q_vals, k=10,
                                         chunk=2048)
        log(f"exact GT: {time.time()-t:.0f}s")

    with open(os.path.join(args.out, "groundtruth.tsv"), "w") as f:
        for qi, row in enumerate(gt_ids):
            for rank, did in enumerate(row):
                if did < 0:
                    continue
                score = (
                    float(gt_scores[qi][rank]) if gt_scores is not None
                    else 0.0
                )
                f.write(f"{qi}\t{did}\t{rank + 1}\t{score:.6f}\n")
    log(f"export complete -> {args.out}")


if __name__ == "__main__":
    main()
