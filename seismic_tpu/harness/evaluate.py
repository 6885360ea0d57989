"""Quality metrics: accuracy@k vs exact ground truth and MRR@k vs qrels.

Replaces the reference's recall script and ir_measures usage
(reference: scripts/recall.py:17-34, scripts/run_experiments.py:242-309)
with self-contained implementations (no network-installed deps); if
`ir_measures` happens to be importable, `compute_metric` can defer to it.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, List, Tuple


def read_run_tsv(path: str) -> Dict[str, List[Tuple[str, float]]]:
    """Run file rows: query_id \t doc_id \t rank \t score."""
    run = defaultdict(list)
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 4:
                continue
            qid, doc, rank, score = parts[0], parts[1], int(parts[2]), float(
                parts[3]
            )
            run[qid].append((rank, doc, score))
    return {
        q: [(d, s) for _, d, s in sorted(rows)] for q, rows in run.items()
    }


def accuracy_at_k(
    run: Dict[str, List[Tuple[str, float]]],
    gt: Dict[str, List[Tuple[str, float]]],
    k: int = 10,
) -> float:
    """Fraction of exact top-k docs retrieved (the reference's recall /
    accuracy@10, scripts/recall.py)."""
    hits = tot = 0
    for qid, gt_rows in gt.items():
        g = {d for d, _ in gt_rows[:k]}
        r = {d for d, _ in run.get(qid, [])[:k]}
        hits += len(g & r)
        tot += len(g)
    return hits / max(tot, 1)


def read_qrels(path: str) -> Dict[str, Dict[str, int]]:
    """TREC qrels: query_id [iteration] doc_id relevance."""
    qrels: Dict[str, Dict[str, int]] = defaultdict(dict)
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 4:
                qid, _, doc, rel = parts
            elif len(parts) == 3:
                qid, doc, rel = parts
            else:
                continue
            qrels[qid][doc] = int(rel)
    return qrels


def mrr_at_k(
    run: Dict[str, List[Tuple[str, float]]],
    qrels: Dict[str, Dict[str, int]],
    k: int = 10,
    min_rel: int = 1,
) -> float:
    """Mean reciprocal rank at k over queries present in the qrels
    (RR@10 in the reference experiments, run_experiments.py:242-284)."""
    total = 0.0
    n = 0
    for qid, rels in qrels.items():
        n += 1
        for rank, (doc, _) in enumerate(run.get(qid, [])[:k], start=1):
            if rels.get(doc, 0) >= min_rel:
                total += 1.0 / rank
                break
    return total / max(n, 1)


def results_to_run(results) -> Dict[str, List[Tuple[str, float]]]:
    """Convert batch_search output [[(qid, score, doc), ...], ...]."""
    run: Dict[str, List[Tuple[str, float]]] = {}
    for rows in results:
        if not rows:
            continue
        qid = rows[0][0]
        run[qid] = [(doc, score) for _, score, doc in rows]
    return run
