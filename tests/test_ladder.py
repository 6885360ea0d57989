"""Vocab ladder (per-list adaptive V, search/ladder.py): class
assignment, per-class tile subsetting, and end-to-end recall parity
with the single-width grouped path."""

import numpy as np
import pytest

from seismic_tpu import Configuration, TpuLayout
from seismic_tpu.build.builder import build_index
from seismic_tpu.data.sparse import PAD_COMPONENT
from seismic_tpu.search.engine import pad_queries
from seismic_tpu.search.exact import exact_search_numpy
from seismic_tpu.search.grouped import GroupedParams, search_grouped
from seismic_tpu.search.ladder import (
    assign_classes,
    ladder_contexts,
    prepare_ladder,
    search_ladder,
)
from seismic_tpu.search.planner import PlannerContext
from tests.conftest import make_random_dataset, make_random_queries


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    ds = make_random_dataset(rng, n_docs=400, dim=600, min_nnz=15,
                             max_nnz=50, seed=43)
    cfg = Configuration(layout=TpuLayout(max_block_len=16,
                                         summary_vocab_cap=256))
    arrays = build_index(ds, cfg)
    qc, qv = make_random_queries(np.random.default_rng(2), n_queries=16,
                                 dim=600, min_nnz=8, max_nnz=30)
    q_comps, q_vals = pad_queries(qc, qv, 64)
    _, gt_i = exact_search_numpy(ds, q_comps, q_vals, k=10)
    return ds, arrays, q_comps, q_vals, gt_i


def _recall(ids, gt_ids, k=10):
    hits = tot = 0
    for row, gt in zip(ids, gt_ids):
        r = {int(d) for d in row[:k] if d >= 0}
        g = {int(d) for d in gt[:k] if d >= 0}
        hits += len(r & g)
        tot += len(g)
    return hits / max(tot, 1)


def test_build_emits_ladder_metadata(setup):
    _, arrays, _, _, _ = setup
    assert arrays.vocab_rank is not None and arrays.vocab_csum is not None
    lv = np.asarray(arrays.list_vocab)
    vr = np.asarray(arrays.vocab_rank)
    valid = (lv >= 0) & (lv != PAD_COMPONENT)
    # ranks are a permutation of 0..n_real-1 per list; PAD cols are 32767
    for li in range(lv.shape[0]):
        n = int(valid[li].sum())
        if n == 0:
            continue
        r = np.sort(vr[li][valid[li]])
        assert (r == np.arange(n)).all(), li
        assert (vr[li][~valid[li]] == 32767).all(), li
    # coverage is monotone in V, and reaches 1.0 once the grid width
    # exceeds the whole dimensionality (dim=600 here: every list's full
    # term set fits under the 1024 grid point; note the KEPT vocab may be
    # truncated at v_cap while the coverage denominator is the total)
    cs = np.asarray(arrays.vocab_csum)
    assert (np.diff(cs, axis=1) >= -1e-6).all()
    from seismic_tpu.build.builder import VOCAB_CSUM_GRID

    gi = VOCAB_CSUM_GRID.index(1024)
    nz = valid.sum(1) > 0
    assert np.allclose(cs[nz, gi], 1.0, atol=1e-5)


def test_class_assignment(setup):
    _, arrays, _, _, _ = setup
    cls = assign_classes(arrays, (128, 256), coverage=0.995)
    lv = np.asarray(arrays.list_vocab)
    valid = (lv >= 0) & (lv != PAD_COMPONENT)
    n_real = valid.sum(1)
    # lists whose entire vocab fits 128 must be class 0
    assert (cls[n_real <= 128] == 0).all()
    assert set(np.unique(cls)) <= {0, 1}


def test_ladder_tiles_match_fullwidth(setup):
    """Class-c tile rows must equal the importance-top-V_c column subset
    of the full-width rows (codes and scales unchanged)."""
    _, arrays, _, _, _ = setup
    list_class, hosts = prepare_ladder(arrays, (128, 256), csub=1)
    tiles = np.asarray(arrays.doc_tiles)
    lv = np.asarray(arrays.list_vocab)
    vr = np.asarray(arrays.vocab_rank)
    checked = 0
    for c, h in enumerate(hosts):
        V_c = h["V"]
        for li in np.flatnonzero((list_class == c)
                                 & (arrays.list_len > 0))[:10]:
            ln = int(arrays.list_len[li])
            ps = int(arrays.list_post_start[li])
            cols = np.flatnonzero(
                (vr[li] < V_c) & (lv[li] >= 0) & (lv[li] != PAD_COMPONENT)
            )
            dst = int(h["region_start"][li]) * 128
            got = h["tiles"].view(np.uint8)[dst:dst + ln, :len(cols)]
            assert (got == tiles[ps:ps + ln][:, cols]).all(), (c, li)
            # the class vocab row is the comp-sorted subset
            vex = lv[li, cols]
            assert (h["vocab16"][li, :len(cols)] == vex).all(), (c, li)
            assert (np.diff(vex) > 0).all()
            checked += 1
    assert checked > 5


@pytest.mark.slow
def test_ladder_search_recall(setup):
    """Ladder search must track the single-width exact-pool recall."""
    ds, arrays, q_comps, q_vals, gt_i = setup
    ctx1 = PlannerContext.from_arrays(arrays)
    dev1 = arrays.to_device(pallas_tiles=True)
    base = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                         pool_mode="exact")
    _, i_b = search_grouped(dev1, ctx1, q_comps, q_vals, base, query_cut=10)
    r_b = _recall(i_b, gt_i)

    dev = arrays.to_device(ladder=(128, 256))
    list_class, hosts = prepare_ladder(arrays, (128, 256), csub=1)
    ctxs = ladder_contexts(arrays, list_class, hosts, csub=1)
    lp = GroupedParams(k=10, score_cut=64, pool=128, rescore=48,
                       compute_dtype="i8", pool_mode="stride",
                       pool_stride=4)
    _, i_l = search_ladder(dev, ctxs, q_comps, q_vals, lp, query_cut=10)
    assert _recall(i_l, gt_i) >= r_b - 0.02

    # unrolled item-major kernel: identical results to U=1
    import dataclasses

    lpu = dataclasses.replace(lp, kernel_unroll=2)
    _, i_u = search_ladder(dev, ctxs, q_comps, q_vals, lpu, query_cut=10)
    np.testing.assert_array_equal(i_u, i_l)

    # per-class plans cover ALL selected pairs exactly once across classes
    from seismic_tpu.search.planner import plan_grouped

    plans = [plan_grouped(q_comps, q_vals, c, 10) for c in ctxs]
    tot_pairs = sum(p.pair_valid.sum() for p in plans)
    full = plan_grouped(q_comps, q_vals, ctx1, 10)
    assert tot_pairs == full.pair_valid.sum()
