"""narrow_vocab (ops/pallas_tiles.py): deriving a narrower-tile-vocab
index from a built one without rebuilding — column subset correctness
vs the builder's vocab_rank, and grouped-search recall tracking the
full-width index (probe_r3n's width-ladder premise)."""

import numpy as np

from seismic_tpu.build.builder import build_index
from seismic_tpu.config import Configuration, TpuLayout
from seismic_tpu.data.sparse import PAD_COMPONENT
from seismic_tpu.ops.pallas_tiles import narrow_vocab
from seismic_tpu.search.engine import pad_queries
from seismic_tpu.search.exact import exact_search_numpy
from seismic_tpu.search.grouped import GroupedParams, search_grouped
from seismic_tpu.search.planner import PlannerContext
from tests.conftest import make_random_dataset, make_random_queries


def _pad_of(lv):
    return -1 if lv.dtype == np.int16 else PAD_COMPONENT


def test_narrow_vocab_columns_and_codes():
    rng = np.random.default_rng(5)
    ds = make_random_dataset(rng, n_docs=400, dim=900, min_nnz=20,
                             max_nnz=60, seed=13)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256))
    arrays = build_index(ds, cfg)
    V0 = 128
    na = narrow_vocab(arrays, V0)
    lv, vr = np.asarray(arrays.list_vocab), np.asarray(arrays.vocab_rank)
    nlv, nvr = np.asarray(na.list_vocab), np.asarray(na.vocab_rank)
    assert nlv.shape == (arrays.n_lists, V0)
    assert na.doc_tiles.shape[1] == V0
    assert na.dense_summary.shape[1] == V0

    lps = np.asarray(arrays.list_post_start, np.int64)
    ll = np.asarray(arrays.list_len, np.int64)
    pad = _pad_of(lv)
    for li in (0, 1, int(ll.argmax())):
        keep = np.nonzero(vr[li] < V0)[0]  # original column order
        n = len(keep)
        assert (nlv[li][:n] == lv[li][keep]).all()
        assert (nlv[li][n:] == pad).all()
        assert (nvr[li][:n] == vr[li][keep]).all()
        assert (nvr[li][n:] == 32767).all()
        # tile codes of kept columns are bit-identical, scales shared
        s, e = int(lps[li]), int(lps[li] + ll[li])
        assert (np.asarray(na.doc_tiles[s:e, :n])
                == np.asarray(arrays.doc_tiles[s:e][:, keep])).all()
        assert (np.asarray(na.doc_tiles[s:e, n:]) == 0).all()
    assert na.doc_tile_scale is arrays.doc_tile_scale
    # embedded config reflects the new width
    assert na.config.layout.summary_vocab_cap == V0


def test_narrow_vocab_search_recall_tracks_full_width():
    rng = np.random.default_rng(8)
    ds = make_random_dataset(rng, n_docs=500, dim=700, min_nnz=15,
                             max_nnz=50, seed=29)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=512))
    arrays = build_index(ds, cfg)
    qc, qv = make_random_queries(np.random.default_rng(6), n_queries=16,
                                 dim=700, min_nnz=8, max_nnz=25)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    _, gt_i = exact_search_numpy(ds, q_comps, q_vals, k=10)

    def recall(ids):
        hits = tot = 0
        for row, gt in zip(ids, gt_i):
            hits += len({int(d) for d in row[:10] if d >= 0}
                        & {int(d) for d in gt[:10] if d >= 0})
            tot += 10
        return hits / tot

    gp = GroupedParams(k=10, score_cut=64, pool=64, rescore=48,
                       compute_dtype="i8", pool_mode="exact")
    dev = arrays.to_device(pallas_tiles=True)
    ctx = PlannerContext.from_arrays(arrays)
    _, i_full = search_grouped(dev, ctx, q_comps, q_vals, gp, query_cut=10)

    na = narrow_vocab(arrays, 128)
    devn = na.to_device(pallas_tiles=True)
    ctxn = PlannerContext.from_arrays(na)
    _, i_n = search_grouped(devn, ctxn, q_comps, q_vals, gp, query_cut=10)
    # the deep pool + exact rescore absorb the narrower tile's censoring
    assert recall(i_n) >= recall(i_full) - 0.05
