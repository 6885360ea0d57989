"""TOML-driven build -> query -> evaluate experiment pipeline.

Functional equivalent of the reference harness
(reference: scripts/run_experiments.py): a TOML file with
[settings]/[folder]/[filename]/[indexing_parameters]/[query.*] sections
drives an index build, one timed query run per [query.X] subsection,
accuracy@k against exact ground truth, an optional MRR metric against
qrels, and a report.tsv. Differences by design: results are captured
in-process as structured dicts (no regex-scraping of stdout,
SURVEY.md §5 tracing note), and git context is recorded in the report
directory.

TOML schema (docs/TomlInstructions.md in the reference):

  [settings]        k, metric ("RR@10"), exp-name, ...
  [folder]          data (dir with documents.bin/queries.bin/...),
                    experiment (output root)
  [filename]        dataset, queries, groundtruth (TSV), qrels (optional)
  [indexing_parameters]   n-postings, centroid-fraction, summary-energy, ...
  [query.NAME]      query-cut, heap-factor, n-knn, batch-size, ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

try:
    import tomllib
except ImportError:  # pragma: no cover
    import tomli as tomllib  # type: ignore


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def git_info(repo_dir: str) -> dict:
    """Record branch + commit per experiment
    (reference: run_experiments.py:28-54)."""
    def run(cmd):
        try:
            return subprocess.check_output(
                cmd, cwd=repo_dir, text=True, stderr=subprocess.DEVNULL
            ).strip()
        except Exception:
            return None

    return {
        "branch": run(["git", "rev-parse", "--abbrev-ref", "HEAD"]),
        "commit": run(["git", "rev-parse", "HEAD"]),
    }


def index_filename(params: dict) -> str:
    """Encode build params in the index filename
    (reference: run_experiments.py:111-123)."""
    parts = []
    for key in sorted(params):
        val = str(params[key]).replace("/", "_")
        parts.append(f"{key.replace('-', '')[:8]}_{val}")
    name = ".".join(parts)
    return name[:180]


def build_base_index(config: dict, exp_dir: str) -> tuple[str, float]:
    folder = config["folder"]
    filename = config.get("filename", {})
    ip = dict(config.get("indexing_parameters", {}))
    data_dir = folder["data"]
    dataset_file = os.path.join(data_dir, filename.get("dataset",
                                                       "documents.bin"))
    index_dir = os.path.join(exp_dir, "indexes")
    os.makedirs(index_dir, exist_ok=True)
    out = os.path.join(index_dir, index_filename(ip) or "index")
    full = out + ".index.seismic_tpu"
    if os.path.exists(full):
        log(f"index exists, reusing: {full}")
        return full, 0.0

    argv = ["--input-file", dataset_file, "--output-file", out]
    for key, val in ip.items():
        flag = "--" + key.replace("_", "-")
        if isinstance(val, bool):
            if val:
                argv.append(flag)
        else:
            argv += [flag, str(val)]
    from ..cli.build_inverted_index import main as build_main

    t0 = time.time()
    rc = build_main(argv)
    if rc:
        raise RuntimeError(f"index build failed with code {rc}")
    return full, time.time() - t0


def query_execution(
    config: dict, index_file: str, qname: str, qparams: dict, exp_dir: str
) -> dict:
    folder = config["folder"]
    filename = config.get("filename", {})
    settings = config.get("settings", {})
    query_file = os.path.join(
        folder["data"], filename.get("queries", "queries.bin")
    )
    run_path = os.path.join(exp_dir, f"run_{qname}.tsv")
    argv = [
        "--index-file", index_file,
        "--query-file", query_file,
        "--output-path", run_path,
        "-k", str(settings.get("k", 10)),
    ]
    for key, val in qparams.items():
        flag = "--" + key.replace("_", "-")
        if isinstance(val, bool):
            if val:
                argv.append(flag)
        else:
            argv += [flag, str(val)]

    from ..cli.perf_inverted_index import main as perf_main
    import io
    import contextlib

    buf = io.StringIO()
    t0 = time.time()
    with contextlib.redirect_stdout(buf):
        rc = perf_main(argv)
    if rc:
        raise RuntimeError(f"perf run failed with code {rc}")
    out = buf.getvalue()
    log(out)
    us = None
    total_bytes = None
    for line in out.splitlines():
        if "microsecs per query" in line and us is None:
            us = float(line.split()[1])
        if line.strip().startswith("Total:"):
            total_bytes = int(line.split()[1])
    return {
        "name": qname,
        "run_path": run_path,
        "us_per_query": us,
        "total_bytes": total_bytes,
        "wall_secs": time.time() - t0,
    }


def evaluate_run(config: dict, run_path: str) -> dict:
    from .evaluate import (
        accuracy_at_k,
        compute_metric,
        read_qrels,
        read_run_tsv,
    )

    folder = config["folder"]
    filename = config.get("filename", {})
    settings = config.get("settings", {})
    k = int(settings.get("k", 10))
    out = {}
    run = read_run_tsv(run_path)
    gt_name = filename.get("groundtruth")
    if gt_name:
        gt = read_run_tsv(os.path.join(folder["data"], gt_name))
        out["accuracy"] = accuracy_at_k(run, gt, k)
    qrels_name = filename.get("qrels")
    if qrels_name:
        qrels = read_qrels(os.path.join(folder["data"], qrels_name))
        # arbitrary ir_measures-style metric string from the TOML
        # (reference: run_experiments.py:242-284)
        metric_name = settings.get("metric", f"RR@{k}")
        out["metric"] = compute_metric(run, qrels, metric_name)
        out["metric_name"] = metric_name
    return out


def run_experiment(toml_path: str) -> str:
    with open(toml_path, "rb") as f:
        config = tomllib.load(f)
    settings = config.get("settings", {})
    exp_root = config["folder"].get("experiment", "experiments_out")
    name = settings.get("exp-name", settings.get("exp_name", "exp"))
    exp_dir = os.path.join(exp_root, f"{name}_{int(time.time())}")
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "experiment.toml.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)
    with open(os.path.join(exp_dir, "git.json"), "w") as f:
        json.dump(git_info(os.path.dirname(os.path.abspath(toml_path))), f)

    index_file, build_secs = build_base_index(config, exp_dir)

    rows = []
    queries = config.get("query", {})
    for qname, qparams in queries.items():
        res = query_execution(config, index_file, qname, qparams, exp_dir)
        res.update(evaluate_run(config, res["run_path"]))
        res["build_secs"] = build_secs
        rows.append(res)
        log(f"[{qname}] {res}")

    report = os.path.join(exp_dir, "report.tsv")
    cols = [
        "name", "us_per_query", "accuracy", "metric", "metric_name",
        "total_bytes", "build_secs",
    ]
    with open(report, "w") as f:
        f.write("\t".join(cols) + "\n")
        for r in rows:
            f.write("\t".join(str(r.get(c, "")) for c in cols) + "\n")
    log(f"report written to {report}")

    if settings.get("delete-index", False):
        os.remove(index_file)  # reference: run_experiments.py:559-561
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="TOML experiment runner")
    p.add_argument("--exp", required=True, help="experiment TOML file")
    args = p.parse_args(argv)
    run_experiment(args.exp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
