"""Document-sharded multi-chip search.

The genuinely new layer relative to the single-node reference (SURVEY.md
§2.7): documents are partitioned into contiguous shards, each chip builds /
holds an independent index over its shard, and a query batch is answered by
running the ordinary jitted search program per shard followed by an
all-gather of the per-shard top-k and a final merge. Deterministic
tie-breaking (score desc, lower global doc id first) keeps multi-chip
results identical to a single-chip run over the concatenated collection.

Mesh axes: queries shard over "data", documents over "docs"; the merge
all-gather rides ICI.
"""

from __future__ import annotations

import functools
import json
import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import Configuration
from ..data.sparse import PAD_COMPONENT, CsrDataset
from ..search.engine import SearchParams, _search_impl
from ..types import DeviceIndex, IndexArrays


# ---------------------------------------------------------------------------
# Host-side shard construction
# ---------------------------------------------------------------------------


def _pad_rows(a: np.ndarray, n: int, fill) -> np.ndarray:
    if a.shape[0] == n:
        return a
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad, constant_values=fill)


def _pad_cols(a: np.ndarray, n: int, fill) -> np.ndarray:
    if a.shape[1] == n:
        return a
    pad = [(0, 0), (0, n - a.shape[1])] + [(0, 0)] * (a.ndim - 2)
    return np.pad(a, pad, constant_values=fill)


def pad_shards_to_common_shapes(shards: List[IndexArrays]) -> List[IndexArrays]:
    """Pad every shard's arrays so all shards share identical shapes (the
    static-shape requirement for one SPMD program across chips)."""
    n_docs = max(s.fwd_comps.shape[0] for s in shards)
    width = max(s.fwd_comps.shape[1] for s in shards)
    mb = max(s.max_blocks_per_list for s in shards)
    mll = max(s.max_list_len for s in shards)
    # extra mll tail so every shard can slice [max_list_len] windows at any
    # of its real list offsets
    n_post = max(s.postings.shape[0] for s in shards) + mll
    n_pbl = max(
        (s.posting_block_local.shape[0] for s in shards
         if s.posting_block_local is not None),
        default=0,
    ) + mll
    nbp = max(max(s.block_start.shape[0] for s in shards),
              max(int(s.list_n_blocks.sum()) for s in shards) + mb + 1)
    n_tile = max(
        (s.doc_tiles.shape[0] for s in shards if s.doc_tiles is not None),
        default=0,
    ) + mll
    nknn = max(s.nknn for s in shards)
    out = []
    for s in shards:
        t = IndexArrays(
            fwd_comps=_pad_cols(
                _pad_rows(s.fwd_comps, n_docs, PAD_COMPONENT), width,
                PAD_COMPONENT,
            ),
            fwd_vals=_pad_cols(_pad_rows(s.fwd_vals, n_docs, 0), width, 0),
            fwd_val_min=None
            if s.fwd_val_min is None
            else _pad_rows(s.fwd_val_min, n_docs, 0),
            fwd_val_step=None
            if s.fwd_val_step is None
            else _pad_rows(s.fwd_val_step, n_docs, 0),
            postings=_pad_rows(s.postings, n_post, 0),
            block_start=_pad_rows(s.block_start, nbp, 0),
            block_len=_pad_rows(s.block_len, nbp, 0),
            list_block_start=s.list_block_start,
            list_n_blocks=s.list_n_blocks,
            summary_comps=None
            if s.summary_comps is None
            else _pad_rows(s.summary_comps, nbp, PAD_COMPONENT),
            summary_codes=None
            if s.summary_codes is None
            else _pad_rows(s.summary_codes, nbp, 0),
            summary_min=_pad_rows(s.summary_min, nbp, 0),
            summary_quant=_pad_rows(s.summary_quant, nbp, 0),
            list_vocab=s.list_vocab,
            vocab_rank=s.vocab_rank,
            vocab_csum=s.vocab_csum,
            dense_summary=None
            if s.dense_summary is None
            else _pad_rows(s.dense_summary, nbp, 0),
            dense_scale=None
            if s.dense_scale is None
            else _pad_rows(s.dense_scale, nbp, 0),
            doc_tiles=None
            if s.doc_tiles is None
            else _pad_rows(s.doc_tiles, n_tile, 0),
            doc_tile_scale=None
            if s.doc_tile_scale is None
            else _pad_rows(s.doc_tile_scale, n_tile, 0),
            tile_ovf_comps=None
            if s.tile_ovf_comps is None
            else _pad_rows(s.tile_ovf_comps, n_tile, -1),
            tile_ovf_vals=None
            if s.tile_ovf_vals is None
            else _pad_rows(s.tile_ovf_vals, n_tile, 0),
            list_post_start=s.list_post_start,
            list_len=s.list_len,
            posting_block_local=None
            if s.posting_block_local is None
            else _pad_rows(s.posting_block_local, n_pbl, 0),
            block_sketch=None
            if s.block_sketch is None
            else _pad_rows(s.block_sketch, nbp, 0),
            block_sketch_scale=None
            if s.block_sketch_scale is None
            else _pad_rows(s.block_sketch_scale, nbp, 0),
            doc_sketch=None
            if s.doc_sketch is None
            else _pad_rows(s.doc_sketch, n_docs, 0),
            doc_sketch_scale=None
            if s.doc_sketch_scale is None
            else _pad_rows(s.doc_sketch_scale, n_docs, 0),
            knn=None
            if s.knn is None and nknn == 0
            else _pad_rows(
                s.knn
                if s.knn is not None
                else np.full((s.n_docs, nknn), -1, np.int32),
                n_docs,
                -1,
            ),
            dim=s.dim,
            n_docs=n_docs,
            max_blocks_per_list=mb,
            max_block_len=s.max_block_len,
            max_list_len=mll,
            config=s.config,
        )
        out.append(t)
    return out


@dataclass
class ShardedIndex:
    """A stacked, device-sharded index: every array leaf has a leading
    [n_shards] axis sharded over the "docs" mesh axis."""

    stacked: DeviceIndex  # leaves [n_shards, ...]
    doc_offsets: jnp.ndarray  # [n_shards] global id of each shard's doc 0
    mesh: Mesh
    n_shards: int
    total_docs: int
    config: Optional[Configuration] = None
    # host copies of the (padded) per-shard arrays, kept for save();
    # None when the index was built elsewhere and not loaded from disk
    host_shards: Optional[List[IndexArrays]] = field(
        default=None, repr=False
    )
    host_offsets: Optional[List[int]] = None
    # per-shard grouped-path planner contexts (pallas_tiles uploads only)
    planner_ctxs: Optional[list] = field(default=None, repr=False)

    @staticmethod
    def build(
        dataset: CsrDataset,
        mesh: Mesh,
        config: Optional[Configuration] = None,
        value_dtype: str = "f32",
        progress: bool = False,
        n_workers: int = 0,
        pallas_tiles: bool = False,
        tile_csub: int = 1,
        tile_hash: int = 0,
        tile_block: int = 0,
    ) -> "ShardedIndex":
        """Split the collection into contiguous shards, build one index per
        shard (embarrassingly parallel, like the reference's per-list rayon
        build), pad to common shapes, stack, and lay out over the mesh.

        n_workers > 1 builds shards concurrently in a thread pool (the
        native build core releases the GIL inside the C++ call, so threads
        scale on multi-core hosts); 0 = one worker per shard capped at
        os.cpu_count().
        """
        from ..build.builder import build_index

        config = config or Configuration()
        n_shards = mesh.shape["docs"]
        n = len(dataset)
        bounds = np.linspace(0, n, n_shards + 1).astype(np.int64)
        offsets = [int(bounds[s]) for s in range(n_shards)]

        def build_one(s):
            lo, hi = int(bounds[s]), int(bounds[s + 1])
            sub = dataset.subset(np.arange(lo, hi))
            return build_index(sub, config, value_dtype=value_dtype,
                               progress=progress)

        if n_workers == 0:
            n_workers = min(n_shards, os.cpu_count() or 1)
        if n_workers > 1:
            with ThreadPoolExecutor(max_workers=n_workers) as ex:
                shards = list(ex.map(build_one, range(n_shards)))
        else:
            shards = [build_one(s) for s in range(n_shards)]
        return ShardedIndex.from_shards(shards, offsets, mesh, n, config,
                                        pallas_tiles=pallas_tiles,
                                        tile_csub=tile_csub,
                                        tile_hash=tile_hash,
                                        tile_block=tile_block)

    @staticmethod
    def from_shards(
        shards: List[IndexArrays],
        doc_offsets: Sequence[int],
        mesh: Mesh,
        total_docs: int,
        config: Optional[Configuration] = None,
        pallas_tiles: bool = False,
        tile_csub: int = 1,
        tile_hash: int = 0,
        tile_block: int = 0,
        lean_fwd: bool = False,
    ) -> "ShardedIndex":
        shards = pad_shards_to_common_shapes(shards)
        if tile_block:
            # block-summary view per shard (memory-lean multi-chip
            # configuration): [n_blocks, V] block tiles + the
            # block_expand exact-rescore tail. Shard searches must pass
            # GroupedParams(block_expand=...). Padded shards share block
            # geometry shapes, so the views stack like any other leaf.
            # DENSE tiles (exact u8 summaries over the list vocab,
            # probe_r3p) when the builds kept dense summaries; hashed
            # rows + per-query projection otherwise.
            assert pallas_tiles, "tile_block requires pallas_tiles"
            assert not tile_hash, "tile_block and tile_hash are exclusive"
            from ..ops.pallas_tiles import block_pool_arrays, narrow_vocab

            if all(s.dense_summary is not None for s in shards):
                width = int(shards[0].dense_summary.shape[1])
                if tile_block < width:
                    shards = [narrow_vocab(s, tile_block) for s in shards]
                    width = tile_block
                assert width == tile_block, (
                    "tile_block must be <= the build summary_vocab_cap "
                    "for dense block tiles", width, tile_block)
                shards = [
                    block_pool_arrays(s, tile_block, order_members=True,
                                      mode="dense")
                    for s in shards
                ]
            else:
                shards = [
                    block_pool_arrays(s, tile_block, order_members=True,
                                      mode="hash")
                    for s in shards
                ]
                tile_hash = tile_block  # hashed rows use the hashed query
        elif tile_hash:
            # hashed tiles per shard (common width => stackable); the
            # grouped shard_map program hashes the query once per query,
            # exactly like the single-chip path
            assert pallas_tiles, "tile_hash requires pallas_tiles"
            from ..ops.pallas_tiles import hash_retile

            shards = [hash_retile(s, tile_hash) for s in shards]
        if pallas_tiles:
            # build each shard's aligned tile layout on host and pad to
            # common shapes (appended rows are zero — beyond every shard's
            # own zero region, so plans stay valid)
            from ..ops_pallas_prep import prepare_pallas_tiles

            aligned = [prepare_pallas_tiles(s, tile_csub) for s in shards]
            max_rows = max(a[0].shape[0] for a in aligned)
            max_sup = max(a[1].shape[0] for a in aligned)
            aligned = [
                (
                    _pad_rows(t, max_rows, 0),
                    _pad_rows(sc, max_sup, 0),
                    rg,
                    ro,
                )
                for (t, sc, rg, ro) in aligned
            ]
            devices = [
                s.to_device(pallas_tiles=True, tile_csub=tile_csub,
                            _aligned=a, tile_hash=tile_hash,
                            lean_fwd=lean_fwd)
                for s, a in zip(shards, aligned)
            ]
        else:
            devices = [s.to_device(lean_fwd=lean_fwd) for s in shards]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *devices)

        def shard_leaf(x):
            spec = P("docs", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        stacked = jax.tree.map(shard_leaf, stacked)
        offs = jax.device_put(
            jnp.asarray(list(doc_offsets), dtype=jnp.int32),
            NamedSharding(mesh, P("docs")),
        )
        ctxs = None
        if pallas_tiles:
            from ..search.planner import PlannerContext

            ctxs = [
                PlannerContext.from_arrays(s, region_start=a[2],
                                           csub=tile_csub)
                for s, a in zip(shards, aligned)
            ]
        return ShardedIndex(
            stacked=stacked,
            doc_offsets=offs,
            mesh=mesh,
            n_shards=len(shards),
            total_docs=total_docs,
            config=config,
            host_shards=shards,
            host_offsets=[int(o) for o in doc_offsets],
            planner_ctxs=ctxs,
        )

    # ------------------------------------------------------------ save/load
    def save(self, path: str) -> str:
        """Persist to `<path>/` — one `.index.seismic_tpu` file per shard
        plus a JSON manifest. Mirrors the reference's "build once, query
        many" index persistence (IndexSerializer, inverted_index.rs:54-59)
        extended with the shard layout.
        """
        if self.host_shards is None:
            raise ValueError(
                "this ShardedIndex holds no host-side shard arrays "
                "(constructed from device state); rebuild or load from disk "
                "before saving"
            )
        os.makedirs(path, exist_ok=True)
        for i, s in enumerate(self.host_shards):
            s.save(os.path.join(path, f"shard{i}"))
        manifest = {
            "n_shards": self.n_shards,
            "total_docs": self.total_docs,
            "doc_offsets": self.host_offsets,
            "config": self.config.to_dict() if self.config else None,
        }
        with open(os.path.join(path, "sharded.json"), "w") as f:
            json.dump(manifest, f)
        return path

    @staticmethod
    def load(path: str, mesh: Mesh, pallas_tiles: bool = False,
             tile_csub: int = 1) -> "ShardedIndex":
        """Load a saved sharded index onto `mesh` (the "docs" axis size must
        match the saved shard count)."""
        with open(os.path.join(path, "sharded.json")) as f:
            manifest = json.load(f)
        n_shards = manifest["n_shards"]
        if mesh.shape["docs"] != n_shards:
            raise ValueError(
                f"saved index has {n_shards} shards but mesh 'docs' axis "
                f"is {mesh.shape['docs']}"
            )
        shards = [
            IndexArrays.load(os.path.join(path, f"shard{i}"))
            for i in range(n_shards)
        ]
        config = (
            Configuration.from_dict(manifest["config"])
            if manifest["config"]
            else None
        )
        return ShardedIndex.from_shards(
            shards,
            manifest["doc_offsets"],
            mesh,
            manifest["total_docs"],
            config,
            pallas_tiles=pallas_tiles,
            tile_csub=tile_csub,
        )

    # ------------------------------------------------------------- search
    def search_batch(
        self,
        q_comps: np.ndarray,
        q_vals: np.ndarray,
        params: SearchParams,
        heap_factor: float = 0.7,
    ):
        """Batched multi-chip search; numpy in, numpy out. The query batch
        must divide the "data" mesh axis size."""
        layout = self.config.layout if self.config else None
        fn = _make_sharded_search(
            self.mesh,
            params,
            layout.sketch_dim if layout else 128,
            layout.sketch_seed if layout else 42,
        )
        scores, ids = fn(
            self.stacked,
            self.doc_offsets,
            jnp.asarray(q_comps, jnp.int32),
            jnp.asarray(q_vals, jnp.float32),
            jnp.float32(heap_factor),
        )
        return np.asarray(scores), np.asarray(ids)


    def search_batch_grouped(
        self,
        q_comps: np.ndarray,
        q_vals: np.ndarray,
        gp,  # GroupedParams
        query_cut: int = 10,
        M: int = 8,
        plan_workers: int = 0,
    ):
        """Multi-chip search on the grouped (list-major) fast path: one
        host plan per (query-shard, doc-shard) cell (each doc shard has
        its own posting lists), packed plans laid out over the
        ("data", "docs") mesh, per-shard grouped kernel + exact rescore
        inside shard_map, all-gather top-k merge over "docs".

        The query batch shards over the "data" axis (its size must divide
        the batch); plans for all cells are computed concurrently in a
        thread pool (the C++ planner releases the GIL) sized
        `plan_workers` (0 = one per cell, capped at cpu_count)."""
        if self.planner_ctxs is None:
            raise ValueError(
                "grouped sharded search needs a pallas_tiles=True index "
                "(build/load/from_shards with pallas_tiles=True)"
            )
        from ..search.grouped import DevicePlan
        from ..search.planner import plan_grouped

        D = self.mesh.shape.get("data", 1)
        S = self.n_shards
        B_total = q_comps.shape[0]
        if B_total % max(D, 1) != 0:
            raise ValueError(
                f"batch {B_total} does not divide the 'data' axis {D}"
            )
        B = B_total // D
        cells = [
            (di, si)
            for di in range(D)
            for si in range(S)
        ]

        def plan_cell(cell):
            di, si = cell
            return plan_grouped(
                q_comps[di * B: (di + 1) * B],
                q_vals[di * B: (di + 1) * B],
                self.planner_ctxs[si], query_cut, M=M,
            )

        if plan_workers == 0:
            plan_workers = min(len(cells), os.cpu_count() or 1)
        if plan_workers > 1 and len(cells) > 1:
            with ThreadPoolExecutor(max_workers=plan_workers) as ex:
                plans = list(ex.map(plan_cell, cells))
        else:
            plans = [plan_cell(c) for c in cells]
        # common capacities across all cells -> one SPMD program
        G_cap = max(p.G_cap for p in plans)
        W_cap = max(p.W_cap for p in plans)
        packed = np.stack([
            DevicePlan.pack_host(
                _repack_plan(p, G_cap, W_cap,
                             self.planner_ctxs[si].zero_region)
            )
            for p, (di, si) in zip(plans, cells)
        ]).reshape(D, S, -1)
        QC = plans[0].pair_slot.shape[1]
        packed_dev = jax.device_put(
            jnp.asarray(packed),
            NamedSharding(self.mesh, P("data", "docs", None)),
        )
        fn = _make_sharded_grouped_search(
            self.mesh, gp, M, G_cap, W_cap, B, QC
        )
        scores, ids = fn(
            self.stacked,
            self.doc_offsets,
            packed_dev,
            jnp.asarray(q_comps, jnp.int32),
            jnp.asarray(q_vals, jnp.float32),
        )
        return np.asarray(scores), np.asarray(ids)

    # ------------------------------------------------------------- knn
    def build_knn(self, nknn: int, batch_size: int = 256) -> None:
        """Build each shard's k-NN graph by batched self-search over the
        shard's own documents (reference: Knn::new,
        inverted_index.rs:448-500; refinement neighborhoods are
        within-shard, like the per-node graphs of a doc-partitioned
        deployment). Updates host shards and re-stacks the device knn
        leaf in place."""
        if self.host_shards is None:
            raise ValueError(
                "build_knn needs host-side shard arrays (build/load first)"
            )
        from ..search import knn as knn_mod

        graphs = []
        for s in self.host_shards:
            dev = s.to_device()
            graphs.append(
                knn_mod.build_knn(s, dev, nknn, batch_size=batch_size)
            )
        n_docs = max(s.fwd_comps.shape[0] for s in self.host_shards)
        for s, g in zip(self.host_shards, graphs):
            s.knn = _pad_rows(g, n_docs, -1)
        import dataclasses as _dc

        stacked_knn = jnp.stack(
            [jnp.asarray(s.knn, jnp.int32) for s in self.host_shards]
        )
        self.stacked = _dc.replace(
            self.stacked,
            knn=jax.device_put(
                stacked_knn,
                NamedSharding(
                    self.mesh, P("docs", *([None] * (stacked_knn.ndim - 1)))
                ),
            ),
        )


def _repack_plan(plan, G_cap: int, W_cap: int, zero_region: int):
    """Pad a GroupedPlan's capacity-sized arrays up to common caps (the
    cross-shard SPMD program needs identical shapes)."""
    import dataclasses as _dc

    if plan.G_cap == G_cap and plan.W_cap == W_cap:
        return plan
    B = plan.slot_b[plan.G:].max() if plan.G_cap else 0

    def padg(a, fill):
        return np.pad(a, (0, G_cap - plan.G_cap), constant_values=fill)

    def padw(a, fill):
        return np.pad(a, (0, W_cap - plan.W_cap), constant_values=fill)

    slot_b = np.pad(
        plan.slot_b, ((0, G_cap - plan.G_cap), (0, 0)),
        constant_values=int(B),
    )
    slot_pair = np.pad(
        plan.slot_pair, (0, (G_cap - plan.G_cap) * plan.M),
        constant_values=0,
    )
    return _dc.replace(
        plan,
        group_list=padg(plan.group_list, 0),
        group_region=padg(plan.group_region, zero_region),
        group_nrows=padg(plan.group_nrows, 0),
        slot_b=slot_b,
        work_region=padw(plan.work_region, zero_region),
        work_g=padw(plan.work_g, plan.G),
        work_s=padw(plan.work_s, 0),
        slot_pair=slot_pair,
    )


@functools.lru_cache(maxsize=None)
def _make_sharded_grouped_search(mesh, gp, M, G_cap, W_cap, B, QC):
    from ..search.grouped import DevicePlan, _grouped_impl

    def local_search(index_stacked, doc_offset, packed, q_comps, q_vals):
        local = jax.tree.map(lambda x: x[0], index_stacked)
        dplan = DevicePlan(packed=packed[0, 0], M=M, G_cap=G_cap,
                           W_cap=W_cap, B=B, QC=QC)
        scores, ids = _grouped_impl(local, dplan, q_comps, q_vals, gp)
        gids = jnp.where(ids >= 0, ids + doc_offset[0], jnp.int32(-1))
        return merge_topk_across_docs(scores, gids)

    jitted = {}

    def fn(stacked, doc_offsets, packed, q_comps, q_vals):
        key = jax.tree.structure(stacked)
        if key not in jitted:
            in_index_specs = jax.tree.map(
                lambda x: P("docs", *([None] * (x.ndim - 1))), stacked
            )
            mapped = shard_map(
                local_search,
                mesh=mesh,
                in_specs=(in_index_specs, P("docs"),
                          P("data", "docs", None),
                          P("data", None), P("data", None)),
                out_specs=(P("data", None), P("data", None)),
                check_vma=False,
            )
            jitted[key] = jax.jit(mapped)
        return jitted[key](stacked, doc_offsets, packed, q_comps, q_vals)

    return fn


def merge_topk_across_docs(scores, gids, axis_name: str = "docs"):
    """Merge per-shard top-k results across the docs mesh axis: all-gather
    [n_shards, B, k] candidates (rides ICI within a host, DCN across
    hosts), then a deterministic (score desc, global id asc) sort-merge.
    Runs inside shard_map; every shard returns the identical merged
    result."""
    all_s = jax.lax.all_gather(scores, axis_name)  # [S, B, k]
    all_i = jax.lax.all_gather(gids, axis_name)
    S, B, k = all_s.shape
    flat_s = jnp.transpose(all_s, (1, 0, 2)).reshape(B, S * k)
    flat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(B, S * k)
    sort_id = jnp.where(flat_i >= 0, flat_i, jnp.int32(2**31 - 1))
    neg_s, _, out_i = jax.lax.sort(
        (-flat_s, sort_id, flat_i), dimension=-1, num_keys=2
    )
    return -neg_s[:, :k], out_i[:, :k]


@functools.lru_cache(maxsize=None)
def _make_sharded_search(mesh, params, sketch_dim, sketch_seed):
    """Build (and cache) the jitted SPMD search for one (mesh, params)."""

    def local_search(index_stacked, doc_offset, q_comps, q_vals, hf):
        # strip the per-shard leading axis of every leaf
        local = jax.tree.map(lambda x: x[0], index_stacked)
        scores, ids = _search_impl(
            local, q_comps, q_vals, hf, params, sketch_dim, sketch_seed
        )
        gids = jnp.where(ids >= 0, ids + doc_offset[0], jnp.int32(-1))
        return merge_topk_across_docs(scores, gids)

    jitted = {}

    def fn(stacked, doc_offsets, q_comps, q_vals, hf):
        key = jax.tree.structure(stacked)
        if key not in jitted:
            in_index_specs = jax.tree.map(
                lambda x: P("docs", *([None] * (x.ndim - 1))), stacked
            )
            mapped = shard_map(
                local_search,
                mesh=mesh,
                in_specs=(in_index_specs, P("docs"), P("data", None),
                          P("data", None), P()),
                out_specs=(P("data", None), P("data", None)),
                check_vma=False,
            )
            jitted[key] = jax.jit(mapped)
        return jitted[key](stacked, doc_offsets, q_comps, q_vals, hf)

    return fn
