"""User-facing API classes.

Mirrors the reference PyO3 binding surface (reference: src/lib.rs:56-70,
src/pylib/mod.rs, src/pylib/dataset.rs, src/pylib/dotvbyte.rs):

- SeismicIndex / SeismicIndexLV        string tokens + doc-id mapping + text
- SeismicIndexRaw / SeismicIndexRawLV  integer component ids, no metadata
- SeismicIndexDotVByte                 u8-compressed forward index
- SeismicDataset / SeismicDatasetLV    growable dataset + exact search
- get_seismic_string()                 numpy dtype for token arrays ("U30")

The u16/u32 split is an API-level vocabulary-capacity check (TPU component
ids are int32 either way); `*LV` classes simply lift the 65,536-token cap
(reference: src/pylib/mod.rs:1162-1166, docs/PythonUsage.md:132).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .config import Configuration, KnnConfig, TpuLayout, default_build_config
from .data import io as data_io
from .data.sparse import CsrDataset, GrowableCsrDataset, PAD_COMPONENT
from .search import knn as knn_mod
from .search.engine import SearchParams, pad_queries, search_batch
from .search.exact import exact_search
from .types import IndexArrays

SEISMIC_STRING = "U30"


def get_seismic_string() -> str:
    """NumPy dtype for token-string arrays (reference: src/pylib/mod.rs:41-44)."""
    return SEISMIC_STRING


_U16_CAP = 1 << 16
# LV component ids are stored as int32 everywhere (data/sparse.py, io.py),
# and PAD_COMPONENT (2^31 - 1) is reserved as the padding sentinel — so the
# true capacity is 2^31 - 1 ids, not the reference's u32 range
# (reference: src/pylib/mod.rs:1163 SeismicIndexLV is u32; our int32 device
# layout trades the top bit for TPU-native integer arithmetic).
_U32_CAP = (1 << 31) - 1

# Default query padding (queries longer than this keep their largest values).
DEFAULT_QUERY_PAD = 128


def _bucket_batch(n: int) -> int:
    """Round batch sizes to powers of two to bound jit recompilation."""
    b = 1
    while b < n:
        b *= 2
    return b


class _IndexBase:
    """Shared engine wrapper (reference: SeismicIndex<S>,
    src/inverted_index_wrapper.rs:94-596)."""

    _component_cap = _U32_CAP
    _value_dtype = "f16"
    # class-level build/search shape: the DotVByte variant disables the
    # replicated doc-tile fast path and defaults to the compressed
    # exact-rescore doc mode (reference memory story, dotvbyte.rs)
    _store_doc_tiles = True
    _default_doc_mode: Optional[str] = None
    # the block-summary grouped fast path (hashed [n_blocks, V] summary
    # tiles + block_expand exact rescore, search/grouped.py): the
    # memory-lean configuration — device state is forward + postings +
    # block geometry + block tiles, no per-posting tile replication
    _use_block_pool = False
    _block_V = 512

    def __init__(
        self,
        arrays: IndexArrays,
        doc_ids: Optional[np.ndarray] = None,
        token_to_id: Optional[dict] = None,
        contents: Optional[list] = None,
    ):
        self._arrays = arrays
        self._doc_ids = doc_ids
        self._token_to_id = token_to_id
        self._contents = contents
        self._device = None
        self._use_pallas = False
        self._planner_ctx = None
        self._query_pad = DEFAULT_QUERY_PAD

    # ------------------------------------------------------------- plumbing
    @property
    def arrays(self) -> IndexArrays:
        return self._arrays

    def _device_index(self):
        if self._device is None:
            import jax

            # the Pallas fused scorer is the fast path on real TPUs;
            # elsewhere (CPU tests) the XLA formulation compiles natively
            self._use_pallas = (
                jax.default_backend() == "tpu"
                and self._arrays.doc_tiles is not None
            )
            self._device = self._arrays.to_device(
                pallas_tiles=self._use_pallas
            )
        return self._device

    def _invalidate_device(self):
        self._device = None
        self._planner_ctx = None
        self._block_device = None
        self._block_ctx = None

    def _block_device_index(self):
        """Lazy device upload of the block-summary view (lean:
        [n_blocks, V] block tiles instead of per-posting doc tiles; the
        i32 forward comps stay on host). Prefers the DENSE block tiles
        (exact u8 summaries over the list vocab, probe_r3p: pools at
        exact-summary quality where the hashed rows lose 3-7 points);
        falls back to hashed rows when the build skipped dense summaries
        (summary_vocab_cap=0)."""
        if getattr(self, "_block_device", None) is None:
            from .ops.pallas_tiles import block_pool_arrays, narrow_vocab
            from .search.planner import PlannerContext

            arrays = self._arrays
            if arrays.dense_summary is not None:
                width = int(arrays.dense_summary.shape[1])
                if self._block_V < width and arrays.vocab_rank is not None:
                    arrays = narrow_vocab(arrays, self._block_V)
                    width = self._block_V
                bv = block_pool_arrays(arrays, width, order_members=True,
                                       mode="dense")
                tile_hash = 0
            else:
                bv = block_pool_arrays(
                    arrays, self._block_V, order_members=True, mode="hash"
                )
                tile_hash = self._block_V
            self._block_E = int(self._arrays.max_block_len)
            self._block_device = bv.to_device(
                pallas_tiles=True, tile_hash=tile_hash, lean_fwd=True
            )
            self._block_ctx = PlannerContext.from_arrays(bv)
        return self._block_device

    def _grouped_ctx(self):
        if self._planner_ctx is None:
            from .search.planner import PlannerContext

            self._planner_ctx = PlannerContext.from_arrays(self._arrays)
        return self._planner_ctx

    # ----------------------------------------------------------- accessors
    @property
    def dim(self) -> int:
        return self._arrays.dim

    @property
    def len(self) -> int:
        return self._arrays.n_docs

    def __len__(self) -> int:
        return self._arrays.n_docs

    @property
    def nnz(self) -> int:
        """Dataset nnz (reference: src/pylib/mod.rs:110-113). Prefers the
        source-dataset count recorded at build time; for old index files
        falls back to counting forward-tile entries, which under-reports
        when layout.max_doc_nnz truncated long documents."""
        if self._arrays.dataset_nnz:
            return int(self._arrays.dataset_nnz)
        return int(np.count_nonzero(self._arrays.fwd_comps != PAD_COMPONENT))

    @property
    def knn_len(self) -> int:
        return self._arrays.nknn

    @property
    def is_empty(self) -> bool:
        return self.len == 0

    def get(self, doc_id: int):
        """Return (components, values) of one document
        (reference: src/pylib/mod.rs:157-165)."""
        comps = self._arrays.fwd_comps[doc_id]
        mask = comps != PAD_COMPONENT
        vals = self._arrays.fwd_vals[doc_id].astype(np.float32)
        if self._arrays.fwd_val_min is not None:
            vals = (
                vals * self._arrays.fwd_val_step[doc_id]
                + self._arrays.fwd_val_min[doc_id]
            )
        return comps[mask].copy(), vals[mask].copy()

    def get_doc_ids_in_postings(self, list_id: int) -> List[int]:
        """Doc ids stored in one posting list
        (reference: inverted_index.rs:89-100)."""
        a = self._arrays
        if not (0 <= list_id < a.n_lists):
            raise ValueError(f"Invalid list_id: {list_id}")
        s = int(a.list_block_start[list_id])
        n = int(a.list_n_blocks[list_id])
        out: List[int] = []
        for b in range(s, s + n):
            st, ln = int(a.block_start[b]), int(a.block_len[b])
            out.extend(int(d) for d in a.postings[st : st + ln])
        return out

    def print_space_usage_byte(self) -> int:
        return self._arrays.print_space_usage_byte()

    # -------------------------------------------------------------- search
    def _search_params(
        self,
        k: int,
        query_cut: int,
        n_knn: int,
        first_sorted: bool,
        block_budget: Optional[int],
        cand_budget: Optional[int],
        block_mode: Optional[str],
        doc_mode: Optional[str] = None,
        full_lists: bool = False,
        score_cut: int = 64,
    ) -> SearchParams:
        if block_mode is None:
            if self._arrays.dense_summary is not None:
                block_mode = "dense"
            elif self._arrays.summary_comps is not None:
                block_mode = "summary"
            else:
                block_mode = "sketch"
        if doc_mode is None:
            if self._default_doc_mode is not None:
                doc_mode = self._default_doc_mode
            else:
                doc_mode = (
                    "tiles" if self._arrays.doc_tiles is not None
                    else "gather"
                )
        self._device_index()  # resolves self._use_pallas
        if block_budget is None:
            block_budget = max(4 * k, 64)
        if cand_budget is None:
            cand_budget = 0
        return SearchParams(
            k=k,
            query_cut=query_cut,
            block_budget=block_budget,
            cand_budget=cand_budget,
            block_mode=block_mode,
            doc_mode=doc_mode,
            full_lists=full_lists,
            score_cut=score_cut,
            n_knn=n_knn,
            first_sorted=first_sorted,
            use_pallas=getattr(self, "_use_pallas", False),
        )

    def _raw_batch_search(
        self,
        comp_lists: Sequence[np.ndarray],
        val_lists: Sequence[np.ndarray],
        k: int,
        query_cut: int,
        heap_factor: float,
        n_knn: int,
        first_sorted: bool,
        block_budget: Optional[int] = None,
        cand_budget: Optional[int] = None,
        block_mode: Optional[str] = None,
        doc_mode: Optional[str] = None,
        full_lists: bool = False,
        score_cut: int = 64,
    ):
        if n_knn > 0 and self._arrays.knn is None:
            raise ValueError(
                "n_knn > 0 but the index has no k-NN graph; call build_knn "
                "or load_knn first"
            )
        B = len(comp_lists)
        if B == 0:
            return np.zeros((0, k), np.float32), np.zeros((0, k), np.int64)
        q_comps, q_vals = pad_queries(comp_lists, val_lists, self._query_pad)
        bb = _bucket_batch(B)
        if bb > B:
            q_comps = np.pad(
                q_comps, ((0, bb - B), (0, 0)), constant_values=PAD_COMPONENT
            )
            q_vals = np.pad(q_vals, ((0, bb - B), (0, 0)))
        # Block-summary grouped fast path (memory-compressed classes):
        # the pool ranks hashed BLOCK summaries, pooled blocks expand
        # into member postings, and every member is exact-rescored from
        # the compressed forward index — the reference's summary gate +
        # evaluate_posting_block economics (posting_list.rs:115-215) at
        # TPU batch shapes. Taken for any heap_factor (the finite block
        # pool plays the heap threshold's work-limiting role); explicit
        # budgets or block/doc mode overrides fall through to the engine
        # path. TPU-only (SEISMIC_BLOCK_POOL=force enables it on CPU for
        # tests).
        if (
            self._use_block_pool
            and self._arrays.summary_comps is not None
            and block_budget is None
            and cand_budget is None
            and block_mode is None
            and doc_mode is None
        ):
            import jax

            if (
                jax.default_backend() == "tpu"
                or os.environ.get("SEISMIC_BLOCK_POOL") == "force"
            ):
                from .search.grouped import (
                    DevicePlan,
                    GroupedParams,
                    search_grouped_jit,
                )
                from .search.planner import plan_grouped

                import jax.numpy as jnp

                index = self._block_device_index()
                pool = max(4 * k, 32)
                gp = GroupedParams(
                    k=k, score_cut=score_cut, pool=pool,
                    block_expand=self._block_E, n_knn=n_knn,
                    compute_dtype="i8", pool_mode="hier",
                    pool_per_pair=max(4, pool // 4),
                )
                plan = plan_grouped(
                    q_comps, q_vals, self._block_ctx, query_cut
                )
                dplan = DevicePlan.put(plan)
                scores, ids = search_grouped_jit(
                    index,
                    dplan,
                    jnp.asarray(q_comps, jnp.int32),
                    jnp.asarray(q_vals, jnp.float32),
                    gp,
                )
                return np.asarray(scores)[:B], np.asarray(ids)[:B]
        # (Round-3 note: a hashed-tile grouped fast path routed here via
        # layout.tile_hash_v; the device grid measured recall collapse to
        # 0.55-0.67 at bench scale, so the routing was removed and the
        # config knob now fails loudly — see TpuLayout.__post_init__.)
        params = self._search_params(
            k, query_cut, n_knn, first_sorted, block_budget, cand_budget,
            block_mode, doc_mode, full_lists, score_cut,
        )
        # The grouped (list-major) path is the TPU fast path: the host
        # planner groups the batch's (query, list) pairs by list so each
        # list's doc tiles stream once per group. It realizes the
        # heap_factor -> 0 exhaustive-scan limit over the selected lists,
        # so it serves full_lists requests and heap_factor == 0 requests.
        # Caller-supplied block/cand budgets are honored only by the engine
        # path (its top_k cutoffs), so a request that sets them falls
        # through rather than silently dropping the budget.
        if (
            params.doc_mode == "tiles"
            and getattr(self, "_use_pallas", False)
            and (full_lists or heap_factor <= 0.0)
            and block_budget is None
            and cand_budget is None
        ):
            from .search.grouped import (
                DevicePlan,
                GroupedParams,
                search_grouped_jit,
            )
            from .search.planner import plan_grouped

            import jax.numpy as jnp

            # tuned operating point: int8 MXU matmul + exact rescore of
            # the top pool (returned scores are exact dot products over
            # the query's top `score_cut` terms) + exact pool select
            # (lax.top_k — the caller asked for exhaustive-scan semantics;
            # the cheaper approx pool stays reachable via GroupedParams).
            # Pool and rescore set scale with k (the engine path uses
            # max(8k, 64); rescore >= 2k keeps the final top_k(k) valid).
            gp = GroupedParams(
                k=k, score_cut=score_cut,
                pool=max(params.dedup_pool, 8 * k, 64), n_knn=n_knn,
                compute_dtype="i8", rescore=max(48, 2 * k),
                pool_mode="exact",
            )
            plan = plan_grouped(
                q_comps, q_vals, self._grouped_ctx(), params.query_cut
            )
            dplan = DevicePlan.put(plan)
            scores, ids = search_grouped_jit(
                self._device_index(),
                dplan,
                jnp.asarray(q_comps, jnp.int32),
                jnp.asarray(q_vals, jnp.float32),
                gp,
            )
            return np.asarray(scores)[:B], np.asarray(ids)[:B]
        layout = self._arrays.config.layout if self._arrays.config else TpuLayout()
        scores, ids = search_batch(
            self._device_index(),
            q_comps,
            q_vals,
            params,
            heap_factor=heap_factor,
            sketch_dim=layout.sketch_dim,
            sketch_seed=layout.sketch_seed,
        )
        return scores[:B], ids[:B]

    # --------------------------------------------------------------- knn
    def build_knn(self, nknn: int, batch_size: int = 256) -> None:
        """Build the k-NN graph by batched self-search
        (reference: Knn::new, inverted_index.rs:448-500)."""
        graph = knn_mod.build_knn(
            self._arrays, self._device_index(), nknn, batch_size=batch_size
        )
        self._arrays.knn = graph
        self._invalidate_device()

    def save_knn(self, path: str) -> str:
        if self._arrays.knn is None:
            raise ValueError("index has no k-NN graph")
        return knn_mod.save_knn(self._arrays.knn, path)

    def load_knn(self, path: str, nknn: Optional[int] = None) -> None:
        self._arrays.knn = knn_mod.load_knn(path, nknn)
        self._invalidate_device()

    def convert(self, value_dtype: str) -> "_IndexBase":
        """Re-encode the built forward index's values in ``value_dtype``
        ("f32"/"f16"/"bf16"/"u8"/"u16", fixedu* aliases accepted) without
        re-running the build pipeline (reference: ConvertFrom,
        src/inverted_index.rs:237-284; the fixedu8 CLI build is an f32
        build followed by this pass,
        src/bin/build_inverted_index.rs:278-286). Returns self."""
        from .build.convert import convert_index

        self._arrays = convert_index(self._arrays, value_dtype)
        self._invalidate_device()
        return self

    # ------------------------------------------------------------ save/load
    def save(self, path: str) -> str:
        p = self._arrays.save(path)
        side = {
            "doc_ids": self._doc_ids,
            "token_to_id": self._token_to_id,
            "contents": self._contents,
        }
        if any(v is not None for v in side.values()):
            import json

            meta_path = p + ".meta.json"
            with open(meta_path, "w") as f:
                json.dump(
                    {
                        "doc_ids": None
                        if self._doc_ids is None
                        else [str(x) for x in self._doc_ids],
                        "token_to_id": self._token_to_id,
                        "contents": self._contents,
                    },
                    f,
                )
        return p

    @classmethod
    def load(cls, path: str):
        arrays = IndexArrays.load(path)
        from .types import INDEX_SUFFIX

        p = path if path.endswith(INDEX_SUFFIX) else path + INDEX_SUFFIX
        doc_ids = token_to_id = contents = None
        meta_path = p + ".meta.json"
        if os.path.exists(meta_path):
            import json

            with open(meta_path) as f:
                side = json.load(f)
            if side.get("doc_ids") is not None:
                doc_ids = np.asarray(side["doc_ids"], dtype=SEISMIC_STRING)
            token_to_id = side.get("token_to_id")
            contents = side.get("contents")
        return cls(arrays, doc_ids, token_to_id, contents)


# ---------------------------------------------------------------------------
# Full-featured string-token index (reference: impl_seismic_index!)
# ---------------------------------------------------------------------------


class SeismicIndex(_IndexBase):
    """String tokens in, string doc ids out; optional stored document text
    for RAG (reference: src/pylib/mod.rs:46-661)."""

    _component_cap = _U16_CAP
    _value_dtype = "f16"

    # ------------------------------------------------------------- build
    @classmethod
    def build(
        cls,
        input_path: str,
        n_postings: int = 3500,
        centroid_fraction: float = 0.1,
        min_cluster_size: int = 2,
        summary_energy: float = 0.4,
        max_fraction: float = 1.5,
        doc_cut: int = 15,
        nknn: int = 0,
        knn_path: Optional[str] = None,
        batched_indexing: Optional[int] = None,  # accepted, ignored (parity)
        input_token_to_id_map: Optional[dict] = None,
        load_content: bool = True,
        num_threads: int = 0,  # accepted, ignored (TPU program is parallel)
        layout: Optional[TpuLayout] = None,
        progress: bool = False,
    ) -> "SeismicIndex":
        dataset, doc_ids, token_to_id, contents = data_io.read_jsonl_dataset(
            input_path,
            token_to_id=input_token_to_id_map,
            load_content=load_content,
            max_vocab=cls._component_cap,
        )
        config = default_build_config(
            n_postings=n_postings,
            centroid_fraction=centroid_fraction,
            min_cluster_size=min_cluster_size,
            summary_energy=summary_energy,
            max_fraction=max_fraction,
            doc_cut=doc_cut,
            nknn=nknn,
            knn_path=knn_path,
            layout=layout,
        )
        return cls._build_from_csr(
            dataset, config, doc_ids, token_to_id,
            contents if load_content else None, progress,
        )

    @classmethod
    def build_from_dataset(
        cls,
        dataset: "SeismicDataset",
        n_postings: int = 3500,
        centroid_fraction: float = 0.1,
        min_cluster_size: int = 2,
        summary_energy: float = 0.4,
        max_fraction: float = 1.5,
        doc_cut: int = 15,
        nknn: int = 0,
        knn_path: Optional[str] = None,
        batched_indexing: Optional[int] = None,
        num_threads: int = 0,
        layout: Optional[TpuLayout] = None,
        progress: bool = False,
    ) -> "SeismicIndex":
        """Convert a growable SeismicDataset into an index
        (reference: src/pylib/mod.rs:408-468, wrapper.rs:368-394)."""
        config = default_build_config(
            n_postings=n_postings,
            centroid_fraction=centroid_fraction,
            min_cluster_size=min_cluster_size,
            summary_energy=summary_energy,
            max_fraction=max_fraction,
            doc_cut=doc_cut,
            nknn=nknn,
            knn_path=knn_path,
            layout=layout,
        )
        csr = dataset._growable.freeze()
        doc_ids = np.asarray(dataset._doc_ids, dtype=SEISMIC_STRING)
        return cls._build_from_csr(
            csr,
            config,
            doc_ids,
            dict(dataset._token_to_id),
            list(dataset._contents),
            progress,
        )

    @classmethod
    def _build_from_csr(
        cls, dataset, config, doc_ids, token_to_id, contents, progress=False
    ):
        from .build.builder import build_index

        arrays = build_index(
            dataset,
            config,
            value_dtype=cls._value_dtype,
            store_doc_tiles=cls._store_doc_tiles,
            progress=progress,
        )
        index = cls(arrays, doc_ids, token_to_id, contents)
        if config.knn.knn_path:
            index.load_knn(config.knn.knn_path, config.knn.nknn or None)
        elif config.knn.nknn > 0:
            index.build_knn(config.knn.nknn)
        return index

    # ------------------------------------------------------------- queries
    def _encode_query(self, query_components, query_values):
        comps, vals = [], []
        t2i = self._token_to_id or {}
        for tok, v in zip(query_components, query_values):
            tid = t2i.get(str(tok))
            if tid is not None:
                comps.append(tid)
                vals.append(float(v))
        return np.asarray(comps, dtype=np.int64), np.asarray(
            vals, dtype=np.float32
        )

    def search(
        self,
        query_id: str,
        query_components: np.ndarray,
        query_values: np.ndarray,
        k: int,
        query_cut: int,
        heap_factor: float,
        n_knn: int = 0,
        sorted: bool = True,
        block_budget: Optional[int] = None,
        cand_budget: Optional[int] = None,
        block_mode: Optional[str] = None,
    ) -> List[Tuple[str, float, str]]:
        """Single query -> [(query_id, score, doc_id)]
        (reference: src/pylib/mod.rs:490-533)."""
        c, v = self._encode_query(query_components, query_values)
        scores, ids = self._raw_batch_search(
            [c], [v], k, query_cut, heap_factor, n_knn, sorted,
            block_budget, cand_budget, block_mode,
        )
        return self._format_results(query_id, scores[0], ids[0])

    def batch_search(
        self,
        queries_ids: np.ndarray,
        query_components: Sequence[np.ndarray],
        query_values: Sequence[np.ndarray],
        k: int,
        query_cut: int,
        heap_factor: float,
        sorted: bool = True,
        n_knn: int = 0,
        num_threads: int = 0,
        block_budget: Optional[int] = None,
        cand_budget: Optional[int] = None,
        block_mode: Optional[str] = None,
    ) -> List[List[Tuple[str, float, str]]]:
        """Batched queries (reference: src/pylib/mod.rs:572-655); the rayon
        fan-out becomes one vmapped device program."""
        encoded = [
            self._encode_query(c, v)
            for c, v in zip(query_components, query_values)
        ]
        scores, ids = self._raw_batch_search(
            [e[0] for e in encoded],
            [e[1] for e in encoded],
            k, query_cut, heap_factor, n_knn, sorted,
            block_budget, cand_budget, block_mode,
        )
        return [
            self._format_results(str(qid), s, i)
            for qid, s, i in zip(queries_ids, scores, ids)
        ]

    def _format_results(self, query_id: str, scores, ids):
        out = []
        for s, d in zip(scores, ids):
            if d < 0 or not np.isfinite(s):
                continue
            doc = (
                str(self._doc_ids[d]) if self._doc_ids is not None else str(int(d))
            )
            out.append((query_id, float(s), doc))
        return out

    # ---------------------------------------------------------------- text
    def get_doc_text(self, doc_id: int) -> Optional[str]:
        """Stored document text for RAG (reference: wrapper.rs:288-293)."""
        if self._contents is None:
            return None
        return self._contents[doc_id]


class SeismicIndexLV(SeismicIndex):
    """Large-vocabulary (> 65,535 tokens) variant."""

    _component_cap = _U32_CAP


# ---------------------------------------------------------------------------
# Raw (metadata-free, integer components) index
# (reference: impl_seismic_index_raw!, src/pylib/mod.rs:663-1151)
# ---------------------------------------------------------------------------


class SeismicIndexRaw(_IndexBase):
    _component_cap = _U16_CAP
    _value_dtype = "f16"

    @classmethod
    def build(
        cls,
        input_file: str,
        n_postings: int = 3500,
        centroid_fraction: float = 0.1,
        min_cluster_size: int = 2,
        summary_energy: float = 0.4,
        max_fraction: float = 1.5,
        doc_cut: int = 15,
        nknn: int = 0,
        knn_path: Optional[str] = None,
        batched_indexing: Optional[int] = None,
        num_threads: int = 0,
        layout: Optional[TpuLayout] = None,
        progress: bool = False,
    ) -> "SeismicIndexRaw":
        """Build from the seismic inner binary format
        (reference: src/pylib/mod.rs:956-1012)."""
        dataset = data_io.read_seismic_format(input_file)
        if dataset.dim > cls._component_cap:
            raise ValueError(
                f"component ids exceed the {cls._component_cap} capacity; "
                "use the LV variant"
            )
        config = default_build_config(
            n_postings=n_postings,
            centroid_fraction=centroid_fraction,
            min_cluster_size=min_cluster_size,
            summary_energy=summary_energy,
            max_fraction=max_fraction,
            doc_cut=doc_cut,
            nknn=nknn,
            knn_path=knn_path,
            layout=layout,
        )
        return cls.build_from_csr(dataset, config, progress=progress)

    @classmethod
    def build_from_csr(
        cls, dataset: CsrDataset, config: Optional[Configuration] = None,
        progress: bool = False,
    ):
        from .build.builder import build_index

        config = config or Configuration()
        arrays = build_index(
            dataset, config, value_dtype=cls._value_dtype,
            store_doc_tiles=cls._store_doc_tiles, progress=progress,
        )
        index = cls(arrays)
        if config.knn.knn_path:
            index.load_knn(config.knn.knn_path, config.knn.nknn or None)
        elif config.knn.nknn > 0:
            index.build_knn(config.knn.nknn)
        return index

    def search(
        self,
        query_components: np.ndarray,
        query_values: np.ndarray,
        k: int,
        query_cut: int,
        heap_factor: float,
        n_knn: int = 0,
        sorted: bool = True,
        block_budget: Optional[int] = None,
        cand_budget: Optional[int] = None,
        block_mode: Optional[str] = None,
    ) -> List[Tuple[float, int]]:
        """-> [(score, internal_doc_id)] (reference: mod.rs:1033-1076)."""
        c = np.asarray(query_components, dtype=np.int64)
        v = np.asarray(query_values, dtype=np.float32)
        scores, ids = self._raw_batch_search(
            [c], [v], k, query_cut, heap_factor, n_knn, sorted,
            block_budget, cand_budget, block_mode,
        )
        return [
            (float(s), int(d))
            for s, d in zip(scores[0], ids[0])
            if d >= 0 and np.isfinite(s)
        ]

    def batch_search(
        self,
        query_path_or_components,
        query_values: Optional[Sequence[np.ndarray]] = None,
        k: int = 10,
        query_cut: int = 10,
        heap_factor: float = 0.7,
        sorted: bool = True,
        n_knn: int = 0,
        num_threads: int = 0,
        block_budget: Optional[int] = None,
        cand_budget: Optional[int] = None,
        block_mode: Optional[str] = None,
    ) -> List[List[Tuple[float, int]]]:
        """Accepts either a queries `.bin` path (reference: mod.rs:1098-1146)
        or explicit component/value lists."""
        if isinstance(query_path_or_components, str):
            qs = data_io.read_seismic_format(query_path_or_components)
            comp_lists = [qs.get(i)[0] for i in range(len(qs))]
            val_lists = [qs.get(i)[1].astype(np.float32) for i in range(len(qs))]
        else:
            comp_lists = [np.asarray(c) for c in query_path_or_components]
            val_lists = [np.asarray(v) for v in query_values]
        scores, ids = self._raw_batch_search(
            comp_lists, val_lists, k, query_cut, heap_factor, n_knn, sorted,
            block_budget, cand_budget, block_mode,
        )
        return [
            [
                (float(s), int(d))
                for s, d in zip(srow, irow)
                if d >= 0 and np.isfinite(s)
            ]
            for srow, irow in zip(scores, ids)
        ]


class SeismicIndexRawLV(SeismicIndexRaw):
    _component_cap = _U32_CAP


class SeismicIndexDotVByte(SeismicIndex):
    """Memory-compressed variant: u8 forward-index values with per-doc
    (min, step) dequantization inside the scoring kernel
    (reference: src/pylib/dotvbyte.rs:32-426, ECIR'26).

    Unlike the other classes this one does NOT build the replicated
    doc-tile fast path — its whole point is the memory budget — and
    searches in the exact-rescore doc mode (block summaries select, the
    Pallas rescore kernel exact-scores survivors from the compressed
    forward index; the reference's evaluate_posting_block economics,
    posting_list.rs:188-215)."""

    _component_cap = _U16_CAP
    _value_dtype = "u8"
    _store_doc_tiles = False
    _default_doc_mode = "rescore"
    # fast path: block-summary grouped search (lean device state — no
    # per-posting tiles; pooled blocks expand into exact rescores)
    _use_block_pool = True

    def build_knn(self, nknn: int, batch_size: int = 256) -> None:
        # Parity with the reference, which cannot build graphs on compressed
        # datasets (dotvbyte.rs:101-112).
        raise NotImplementedError(
            "SeismicIndexDotVByte does not support build_knn; build the "
            "graph on an uncompressed index and load it with load_knn"
        )


# ---------------------------------------------------------------------------
# Growable dataset + exact search (reference: src/pylib/dataset.rs)
# ---------------------------------------------------------------------------


class SeismicDataset:
    """In-memory accumulation API + brute-force exact search, used to compute
    ground truth (reference: wrapper.rs:599-758, FlatIndex)."""

    _component_cap = _U16_CAP

    def __init__(self):
        self._growable = GrowableCsrDataset()
        self._doc_ids: List[str] = []
        self._token_to_id: dict = {}
        self._contents: List[Optional[str]] = []
        self._frozen: Optional[CsrDataset] = None

    @property
    def dim(self) -> int:
        return self._growable.dim

    @property
    def len(self) -> int:
        return len(self._growable)

    def __len__(self) -> int:
        return len(self._growable)

    @property
    def nnz(self) -> int:
        return self._growable.nnz

    def add_document(
        self,
        doc_id: str,
        tokens: Sequence[str],
        values: Sequence[float],
        content: Optional[str] = None,
    ) -> None:
        """(reference: dataset.rs:66-85; incremental token-id assignment)"""
        comps = []
        for tok in tokens:
            tok = str(tok)
            tid = self._token_to_id.get(tok)
            if tid is None:
                tid = len(self._token_to_id)
                if tid >= self._component_cap:
                    raise ValueError(
                        "vocabulary exceeded the component type capacity; "
                        "use the LV variant"
                    )
                self._token_to_id[tok] = tid
            comps.append(tid)
        self._growable.push(comps, values)
        self._doc_ids.append(str(doc_id))
        self._contents.append(content)
        self._frozen = None

    def get_doc_text(self, doc_id: int) -> Optional[str]:
        return self._contents[doc_id]

    def _dataset(self) -> CsrDataset:
        if self._frozen is None:
            self._frozen = self._growable.freeze()
        return self._frozen

    def _encode_query(self, query_components, query_values):
        comps, vals = [], []
        for tok, v in zip(query_components, query_values):
            tid = self._token_to_id.get(str(tok))
            if tid is not None:
                comps.append(tid)
                vals.append(float(v))
        return comps, vals

    def search(
        self,
        query_id: str,
        query_components: np.ndarray,
        query_values: np.ndarray,
        k: int,
    ) -> List[Tuple[str, float, str]]:
        """Exact search (reference: dataset.rs:104-127)."""
        return self.batch_search(
            np.asarray([query_id]), [query_components], [query_values], k
        )[0]

    def batch_search(
        self,
        queries_ids: np.ndarray,
        query_components: Sequence[np.ndarray],
        query_values: Sequence[np.ndarray],
        k: int,
        num_threads: int = 0,
    ) -> List[List[Tuple[str, float, str]]]:
        dataset = self._dataset()
        encoded = [
            self._encode_query(c, v)
            for c, v in zip(query_components, query_values)
        ]
        q_comps, q_vals = pad_queries(
            [e[0] for e in encoded],
            [e[1] for e in encoded],
            max(DEFAULT_QUERY_PAD, max((len(e[0]) for e in encoded), default=1)),
        )
        scores, ids = exact_search(dataset, q_comps, q_vals, k)
        results = []
        for qid, srow, irow in zip(queries_ids, scores, ids):
            row = []
            for s, d in zip(srow, irow):
                if d < 0 or not np.isfinite(s):
                    continue
                row.append((str(qid), float(s), self._doc_ids[int(d)]))
            results.append(row)
        return results


class SeismicDatasetLV(SeismicDataset):
    _component_cap = _U32_CAP
