"""Host-side preparation for the Pallas tile scorer (thin indirection to
avoid a types <-> ops import cycle)."""

from .ops.pallas_tiles import SUB, pallas_align_doc_tiles


def ll_pad_for(max_list_len: int, csub: int = 1) -> int:
    unit = SUB * csub
    return ((max(max_list_len, 1) + unit - 1) // unit) * unit


def prepare_pallas_tiles(arrays, csub: int = 1):
    return pallas_align_doc_tiles(
        arrays, ll_pad_for(arrays.max_list_len, csub), csub
    )
