"""Storage and I/O unit tests (oracle: hand-rolled NumPy)."""

import numpy as np
import pytest

from seismic_tpu.data.sparse import CsrDataset, GrowableCsrDataset, PAD_COMPONENT
from seismic_tpu.data import io as data_io
from tests.conftest import make_random_dataset


def test_csr_from_rows_sorts_components():
    ds = CsrDataset.from_rows([([5, 1, 3], [0.5, 0.1, 0.3]), ([], [])])
    c, v = ds.get(0)
    assert list(c) == [1, 3, 5]
    assert np.allclose(v, [0.1, 0.3, 0.5])
    assert len(ds) == 2 and ds.nnz == 3 and ds.dim == 6
    c1, v1 = ds.get(1)
    assert len(c1) == 0 and len(v1) == 0


def test_csr_rejects_duplicates():
    with pytest.raises(ValueError):
        CsrDataset.from_rows([([1, 1], [0.1, 0.2])])


def test_padded_tiles_roundtrip(rng):
    ds = make_random_dataset(rng, n_docs=50, dim=300, seed=7)
    comps, vals = ds.padded_tiles(64)
    dense_from_tiles = np.zeros((50, 300), np.float32)
    for i in range(50):
        m = comps[i] != PAD_COMPONENT
        dense_from_tiles[i, comps[i][m]] = vals[i][m]
        # components stay sorted within the row
        assert np.all(np.diff(comps[i][m]) > 0)
    assert np.allclose(dense_from_tiles, ds.to_dense())


def test_padded_tiles_truncation_keeps_largest():
    ds = CsrDataset.from_rows([(range(10), [1, 9, 2, 8, 3, 7, 4, 6, 5, 10])])
    comps, vals = ds.padded_tiles(4)
    m = comps[0] != PAD_COMPONENT
    assert sorted(vals[0][m].tolist()) == [7, 8, 9, 10]


def test_growable_dataset():
    g = GrowableCsrDataset()
    g.push([3, 1], [0.3, 0.1])
    g.push([2], [0.2])
    ds = g.freeze()
    assert len(ds) == 2 and ds.dim == 4
    assert list(ds.get(0)[0]) == [1, 3]


def test_seismic_bin_format_roundtrip(tmp_path, rng):
    ds = make_random_dataset(rng, n_docs=30, dim=200, seed=3)
    p = str(tmp_path / "documents.bin")
    data_io.write_seismic_format(ds, p)
    back = data_io.read_seismic_format(p)
    assert len(back) == len(ds)
    assert np.array_equal(back.components, ds.components)
    assert np.allclose(back.values, ds.values)


def test_toy_jsonl_ingestion(toy_documents_path):
    ds, doc_ids, token_to_id, contents = data_io.read_jsonl_dataset(
        toy_documents_path
    )
    assert len(ds) == 20
    assert len(doc_ids) == 20
    assert ds.dim == len(token_to_id)
    assert contents[0] is not None and "Manhattan" in contents[0]
    # per-doc components sorted
    c0, _ = ds.get(0)
    assert np.all(np.diff(c0) > 0)


def test_token_map_roundtrip(tmp_path):
    m = {"hello": 0, "world": 1}
    p = str(tmp_path / "tok.json")
    data_io.save_token_map(m, p)
    assert data_io.load_token_map(p) == m


def test_subset_and_astype(rng):
    ds = make_random_dataset(rng, n_docs=20, dim=100, seed=11)
    sub = ds.subset(np.array([3, 7, 3]))
    assert len(sub) == 3
    assert np.array_equal(sub.get(0)[0], ds.get(3)[0])
    assert np.array_equal(sub.get(2)[0], ds.get(3)[0])
    h = ds.astype(np.float16)
    assert h.values.dtype == np.float16
