"""Hands-on walkthrough (the reference's HandsOnSeismic notebook, as a
script): build an index over a small JSONL collection, search it, compare
against exact ground truth, build and use a k-NN graph, save and reload.

Run:  python examples/quickstart.py [path/to/documents.jsonl queries.jsonl]
(defaults to the 20-document toy dataset if the reference repo is mounted)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from seismic_tpu import SeismicDataset, SeismicIndex, get_seismic_string

DOCS = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/examples/toy_dataset/documents.jsonl"
)
QUERIES = sys.argv[2] if len(sys.argv) > 2 else (
    "/root/reference/examples/toy_dataset/queries.jsonl"
)

# ---- build ---------------------------------------------------------------
index = SeismicIndex.build(DOCS, n_postings=1000)
print("documents:", index.len)
print("avg nnz:", index.nnz / index.len)
print("dim:", index.dim)
index.print_space_usage_byte()

# ---- load queries ----------------------------------------------------------
string_type = get_seismic_string()
queries = [json.loads(l) for l in open(QUERIES)]
queries_ids = np.array([q["id"] for q in queries], dtype=string_type)
query_components = [
    np.array(list(q["vector"].keys()), dtype=string_type) for q in queries
]
query_values = [
    np.array(list(q["vector"].values()), dtype=np.float32) for q in queries
]

# ---- search ----------------------------------------------------------------
results = index.batch_search(
    queries_ids=queries_ids,
    query_components=query_components,
    query_values=query_values,
    k=5,
    query_cut=20,
    heap_factor=0.7,
)
for row in results[:2]:
    print(row)

# ---- exact ground truth + recall -------------------------------------------
dataset = SeismicDataset()
for line in open(DOCS):
    rec = json.loads(line)
    dataset.add_document(
        str(rec["id"]),
        list(rec["vector"].keys()),
        list(rec["vector"].values()),
        rec.get("content"),
    )
gt = dataset.batch_search(queries_ids, query_components, query_values, k=5)
hits = tot = 0
for r, g in zip(results, gt):
    hits += len({d for _, _, d in r} & {d for _, _, d in g})
    tot += len(g)
print(f"recall@5 vs exact: {hits / tot:.3f}")

# ---- RAG text lookup --------------------------------------------------------
top_doc_internal = None
for qid, score, doc in results[0]:
    pass  # doc ids here are the external string ids
print("top passage text:", (index.get_doc_text(0) or "")[:80], "...")

# ---- k-NN graph -------------------------------------------------------------
index.build_knn(4)
refined = index.batch_search(
    queries_ids, query_components, query_values,
    k=5, query_cut=10, heap_factor=0.9, n_knn=4,
)
print("with kNN refinement:", refined[0][:2])

# ---- save / load ------------------------------------------------------------
path = index.save("/tmp/quickstart_index")
back = SeismicIndex.load(path)
assert back.len == index.len
print("saved to", path)
