"""CLI + experiment-harness integration tests on the toy dataset."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory, toy_documents_path, toy_queries_path):
    """Convert the toy JSONL collection to the inner binary format."""
    d = tmp_path_factory.mktemp("toydata")
    from seismic_tpu.cli.convert_json_to_inner_format import main as conv

    rc = conv(
        [
            "--document-path", toy_documents_path,
            "--query-path", toy_queries_path,
            "--output-dir", str(d),
        ]
    )
    assert rc == 0
    return d


def test_convert_outputs(data_dir):
    for f in (
        "documents.bin",
        "queries.bin",
        "doc_ids.npy",
        "queries_ids.npy",
        "token_to_id_mapping.json",
    ):
        assert (data_dir / f).exists()
    from seismic_tpu.data.io import read_seismic_format

    docs = read_seismic_format(str(data_dir / "documents.bin"))
    assert len(docs) == 20
    qs = read_seismic_format(str(data_dir / "queries.bin"))
    assert len(qs) == 5


def test_build_and_perf_cli(data_dir, tmp_path):
    from seismic_tpu.cli.build_inverted_index import main as build
    from seismic_tpu.cli.perf_inverted_index import main as perf

    out = str(tmp_path / "toy_index")
    rc = build(
        [
            "--input-file", str(data_dir / "documents.bin"),
            "--output-file", out,
            "--n-postings", "100",
            "--max-block-len", "16",
            "--summary-vocab-cap", "256",
        ]
    )
    assert rc == 0
    assert os.path.exists(out + ".index.seismic_tpu")

    run_path = str(tmp_path / "run.tsv")
    rc = perf(
        [
            "--index-file", out,
            "--query-file", str(data_dir / "queries.bin"),
            "--output-path", run_path,
            "-k", "5",
            "--query-cut", "10",
            "--heap-factor", "0.0",
            "--batch-size", "8",
        ]
    )
    assert rc == 0
    rows = [l.split("\t") for l in open(run_path)]
    # <= k results per query; under-filled queries are legal (the reference
    # prints FAIL! and continues, perf_inverted_index.rs:201-207)
    assert 5 <= len(rows) <= 5 * 5
    qids = {r[0] for r in rows}
    assert len(qids) == 5


def test_experiment_runner(data_dir, tmp_path, toy_documents_path):
    # exact ground truth TSV via brute force
    from seismic_tpu.data.io import read_seismic_format
    from seismic_tpu.search.engine import pad_queries
    from seismic_tpu.search.exact import exact_search_numpy

    docs = read_seismic_format(str(data_dir / "documents.bin"))
    qs = read_seismic_format(
        str(data_dir / "queries.bin"), dim=docs.dim
    )
    qc = [qs.get(i)[0] for i in range(len(qs))]
    qv = [qs.get(i)[1] for i in range(len(qs))]
    q_comps, q_vals = pad_queries(qc, qv, 64)
    scores, ids = exact_search_numpy(docs, q_comps, q_vals, k=5)
    with open(data_dir / "gt.tsv", "w") as f:
        for q in range(len(qs)):
            for rank, (s, d) in enumerate(zip(scores[q], ids[q])):
                if d >= 0:
                    f.write(f"{q}\t{d}\t{rank}\t{s:.6f}\n")

    toml = tmp_path / "exp.toml"
    toml.write_text(
        f"""
[settings]
k = 5
exp-name = "toy"
metric = "RR@5"

[folder]
data = "{data_dir}"
experiment = "{tmp_path}/exp_out"

[filename]
dataset = "documents.bin"
queries = "queries.bin"
groundtruth = "gt.tsv"

[indexing_parameters]
n-postings = 100
max-block-len = 16
summary-vocab-cap = 256

[query.fast]
query-cut = 5
heap-factor = 0.8
batch-size = 8

[query.accurate]
# toy queries carry query-only tokens with empty lists; a large query-cut
# is needed to reach every exact top-5 doc (same as the reference)
query-cut = 30
heap-factor = 0.0
batch-size = 8
"""
    )
    from seismic_tpu.harness.run_experiments import run_experiment

    report = run_experiment(str(toml))
    lines = open(report).read().strip().split("\n")
    assert len(lines) == 3  # header + 2 query configs
    header = lines[0].split("\t")
    acc_idx = header.index("accuracy")
    accs = [float(l.split("\t")[acc_idx]) for l in lines[1:]]
    assert accs[1] >= 0.95  # the accurate config recovers the exact top-5
    assert accs[1] >= accs[0] - 1e-9


def test_grid_search_resume(data_dir, tmp_path):
    toml = tmp_path / "grid.toml"
    toml.write_text(
        f"""
[settings]
k = 5
exp-name = "toygrid"

[folder]
data = "{data_dir}"
experiment = "{tmp_path}/grid_out"

[filename]
dataset = "documents.bin"
queries = "queries.bin"
groundtruth = "gt.tsv"

[indexing_parameters]
n-postings = [50, 100]
max-block-len = 16
summary-vocab-cap = 256

[querying_parameters]
query-cut = [5, 10]
heap-factor = 0.8
batch-size = 8
"""
    )
    from seismic_tpu.harness.run_grid_search import (
        completed_combos,
        run_grid,
    )

    run_grid(str(toml))
    root = str(tmp_path / "grid_out" / "grid_toygrid")
    done = completed_combos(root)
    assert len(done) == 4  # 2 x 2 combos
    # resume: a second run skips everything (and is fast)
    import time

    t0 = time.time()
    run_grid(str(toml))
    assert time.time() - t0 < 5
    assert len(completed_combos(root)) == 4

    # best-config extraction
    from seismic_tpu.harness.best_configs import (
        best_config_for_recall,
        collect_grid_results,
    )

    results = collect_grid_results(root)
    assert len(results) == 4
    best = best_config_for_recall(results, 0.3)
    assert best is not None
    assert best["us_per_query"] > 0


def test_compute_metric_family():
    """ir_measures-style metric strings evaluated natively
    (reference: scripts/run_experiments.py:242-284)."""
    from seismic_tpu.harness.evaluate import compute_metric, mrr_at_k

    # q1: relevant docs a (rel 2) and b (rel 1); run returns [a, x, b]
    # q2: relevant doc c; run returns [y, c]
    qrels = {"q1": {"a": 2, "b": 1}, "q2": {"c": 1}}
    run = {
        "q1": [("a", 3.0), ("x", 2.0), ("b", 1.0)],
        "q2": [("y", 2.0), ("c", 1.0)],
    }
    assert compute_metric(run, qrels, "RR@10") == pytest.approx(
        (1.0 + 0.5) / 2
    )
    assert compute_metric(run, qrels, "MRR@10") == pytest.approx(
        mrr_at_k(run, qrels, 10)
    )
    assert compute_metric(run, qrels, "Recall@10") == pytest.approx(
        (2 / 2 + 1 / 1) / 2
    )
    assert compute_metric(run, qrels, "Recall@1") == pytest.approx(
        (1 / 2 + 0) / 2
    )
    assert compute_metric(run, qrels, "P@2") == pytest.approx(
        (1 / 2 + 1 / 2) / 2
    )
    assert compute_metric(run, qrels, "Success@1") == pytest.approx(0.5)
    assert compute_metric(run, qrels, "Success@2") == pytest.approx(1.0)
    # AP: q1 = (1/1 + 2/3)/2, q2 = (1/2)/1
    assert compute_metric(run, qrels, "MAP@10") == pytest.approx(
        ((1.0 + 2 / 3) / 2 + 0.5) / 2
    )
    import math

    # nDCG q1: dcg = 3/log2(2) + 1/log2(4); idcg = 3/log2(2) + 1/log2(3)
    d1 = (3 / 1 + 1 / 2) / (3 / 1 + 1 / math.log2(3))
    d2 = (1 / math.log2(3)) / 1.0
    assert compute_metric(run, qrels, "nDCG@10") == pytest.approx(
        (d1 + d2) / 2
    )
    try:
        import ir_measures  # noqa: F401
    except ImportError:
        with pytest.raises(ValueError):
            compute_metric(run, qrels, "Bpref")
