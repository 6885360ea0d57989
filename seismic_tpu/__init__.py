"""seismic_tpu — a TPU-native search engine for learned sparse embeddings.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TusKANNy/seismic (SIGIR'24 / CIKM'24): approximate top-k maximum-inner-
product search over SPLADE-family sparse vectors via a pruned, blocked,
summarized inverted index — rebuilt as padded dense tiles, sketch matmuls,
and one fully jitted batched search program.

Public API mirrors the reference Python binding (reference: src/lib.rs:56-70,
src/pylib/): SeismicIndex, SeismicIndexLV, SeismicIndexRaw,
SeismicIndexRawLV, SeismicIndexDotVByte, SeismicDataset, SeismicDatasetLV,
get_seismic_string.
"""

from .api import (
    SeismicDataset,
    SeismicDatasetLV,
    SeismicIndex,
    SeismicIndexDotVByte,
    SeismicIndexLV,
    SeismicIndexRaw,
    SeismicIndexRawLV,
    get_seismic_string,
)
from .config import (
    Configuration,
    CoiThresholdPruning,
    EnergyPreservingSummarization,
    FixedSizeBlocking,
    FixedSizePruning,
    FixedSizeSummarization,
    GlobalThresholdPruning,
    KnnConfig,
    RandomKmeans,
    RandomKmeansBlocking,
    RandomKmeansInvertedIndex,
    RandomKmeansInvertedIndexApprox,
    TpuLayout,
    default_build_config,
)
from .data.sparse import CsrDataset, GrowableCsrDataset, PAD_COMPONENT
from .search.engine import SearchParams, pad_queries, search_batch
from .types import DeviceIndex, IndexArrays

__version__ = "0.1.0"

__all__ = [
    "SeismicIndex",
    "SeismicIndexLV",
    "SeismicIndexRaw",
    "SeismicIndexRawLV",
    "SeismicIndexDotVByte",
    "SeismicDataset",
    "SeismicDatasetLV",
    "get_seismic_string",
    "Configuration",
    "default_build_config",
    "TpuLayout",
    "KnnConfig",
    "FixedSizePruning",
    "GlobalThresholdPruning",
    "CoiThresholdPruning",
    "FixedSizeBlocking",
    "RandomKmeansBlocking",
    "FixedSizeSummarization",
    "EnergyPreservingSummarization",
    "RandomKmeans",
    "RandomKmeansInvertedIndex",
    "RandomKmeansInvertedIndexApprox",
    "CsrDataset",
    "GrowableCsrDataset",
    "PAD_COMPONENT",
    "SearchParams",
    "search_batch",
    "pad_queries",
    "IndexArrays",
    "DeviceIndex",
    "__version__",
]
