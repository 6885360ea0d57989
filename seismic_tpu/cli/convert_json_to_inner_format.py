"""CLI: convert a JSONL (or tar.gz) collection to the seismic inner binary
format + side files (doc_ids.npy, queries_ids.npy, token_to_id_mapping.json).

Functional equivalent of the reference converter
(reference: scripts/convert_json_to_inner_format.py:10-27 binary layout,
84-203 readers, 331-349 outputs). Token ids are assigned by sorted token
order over the union of document and query vocabularies, matching the
reference's sorted global token map.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Convert JSONL collections to the seismic binary format"
    )
    p.add_argument("--document-path", required=True)
    p.add_argument("--query-path", default=None)
    p.add_argument("--output-dir", required=True)
    args = p.parse_args(argv)

    from ..data.io import (
        iter_documents,
        save_token_map,
        write_seismic_format,
    )
    from ..data.sparse import CsrDataset

    os.makedirs(args.output_dir, exist_ok=True)

    # pass 1: sorted global token map over docs (+ queries)
    vocab = set()
    for rec in iter_documents(args.document_path):
        vocab.update(rec["vector"].keys())
    if args.query_path:
        for rec in iter_documents(args.query_path):
            vocab.update(rec["vector"].keys())
    token_to_id = {tok: i for i, tok in enumerate(sorted(vocab))}
    print(f"vocabulary size: {len(token_to_id)}")

    def encode(path):
        rows, ids = [], []
        for rec in iter_documents(path):
            ids.append(str(rec["id"]))
            vec = rec["vector"]
            comps = [token_to_id[t] for t in vec.keys()]
            rows.append((comps, list(vec.values())))
        return CsrDataset.from_rows(rows, dim=len(token_to_id)), ids

    docs, doc_ids = encode(args.document_path)
    write_seismic_format(docs, os.path.join(args.output_dir, "documents.bin"))
    np.save(
        os.path.join(args.output_dir, "doc_ids.npy"),
        np.asarray(doc_ids, dtype="U30"),
    )
    print(f"wrote {len(docs)} documents")

    if args.query_path:
        queries, query_ids = encode(args.query_path)
        write_seismic_format(
            queries, os.path.join(args.output_dir, "queries.bin")
        )
        np.save(
            os.path.join(args.output_dir, "queries_ids.npy"),
            np.asarray(query_ids, dtype="U30"),
        )
        print(f"wrote {len(queries)} queries")

    save_token_map(
        token_to_id,
        os.path.join(args.output_dir, "token_to_id_mapping.json"),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
