"""Host-side preparation for the Pallas tile scorer (thin indirection to
avoid a types <-> ops import cycle)."""

from .ops.pallas_tiles import SUB, pallas_align_doc_tiles


def ll_pad_for(max_list_len: int) -> int:
    return ((max(max_list_len, 1) + SUB - 1) // SUB) * SUB


def prepare_pallas_tiles(arrays):
    return pallas_align_doc_tiles(arrays, ll_pad_for(arrays.max_list_len))
