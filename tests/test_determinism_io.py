"""Build determinism (golden reproducibility, SURVEY §4) and remaining
ingestion paths (tar.gz, token-map reuse)."""

import json
import os
import tarfile

import numpy as np

from seismic_tpu import Configuration, SeismicIndex, TpuLayout
from seismic_tpu.build.builder import build_index
from seismic_tpu.data import io as data_io
from tests.conftest import make_random_dataset


def test_build_is_deterministic(rng):
    """Two builds of the same data produce bit-identical indexes (the
    reference pins its k-means seeds for the same reason, utils.rs:163)."""
    ds = make_random_dataset(rng, n_docs=200, dim=400, seed=55)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256))
    a = build_index(ds, cfg)
    b = build_index(ds, cfg)
    for f in ("postings", "block_start", "block_len", "list_vocab",
              "dense_summary", "dense_scale", "doc_tiles",
              "doc_tile_scale", "summary_codes", "summary_min"):
        x, y = getattr(a, f), getattr(b, f)
        assert np.array_equal(x, y), f
    # and the seed changes the result
    import dataclasses

    c = build_index(ds, dataclasses.replace(cfg, seed=999))
    assert not np.array_equal(a.postings, c.postings)


def test_targz_ingestion(tmp_path, toy_documents_path):
    tar_path = str(tmp_path / "docs.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tar:
        tar.add(toy_documents_path, arcname="documents.jsonl")
    ds, doc_ids, token_to_id, contents = data_io.read_jsonl_dataset(tar_path)
    assert len(ds) == 20
    idx = SeismicIndex.build(tar_path, n_postings=100)
    assert idx.len == 20


def test_prebuilt_token_map(toy_documents_path, tmp_path):
    """input_token_to_id_map skips pass 1 and pins component ids
    (reference: build(..., input_token_to_id_map), mod.rs:327-384)."""
    _, _, token_to_id, _ = data_io.read_jsonl_dataset(toy_documents_path)
    # reverse the ids: the map must be honored verbatim
    remapped = {t: len(token_to_id) - 1 - i
                for t, (i) in zip(token_to_id, token_to_id.values())}
    idx = SeismicIndex.build(
        toy_documents_path, n_postings=100,
        input_token_to_id_map=remapped,
    )
    assert idx._token_to_id == remapped
    tok = next(iter(remapped))
    comps, _ = idx.get(0)
    assert idx.dim == len(remapped)


def test_vocab_cap_enforced(tmp_path):
    """u16 classes must reject >65536-token vocabularies."""
    path = str(tmp_path / "big.jsonl")
    with open(path, "w") as f:
        for d in range(8):
            vec = {f"tok{d}_{i}": 1.0 for i in range(10)}
            f.write(json.dumps({"id": d, "vector": vec}) + "\n")
    # small fake cap via monkeypatching the class attribute
    class Tiny(SeismicIndex):
        _component_cap = 50

    import pytest

    with pytest.raises(ValueError):
        Tiny.build(path, n_postings=10)
