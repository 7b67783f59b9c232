from node2vec_tpu.ops.alias import (
    generate_alias_tables,
    generate_edge_alias_tables,
    build_alias_csr,
    alias_draw,
    alias_draw_single,
    alias_draw_single_wiki,
)
from node2vec_tpu.ops.sampling import (
    searchsorted_in_segments,
    contains_in_segments,
)

__all__ = [
    "generate_alias_tables",
    "generate_edge_alias_tables",
    "build_alias_csr",
    "alias_draw",
    "alias_draw_single",
    "alias_draw_single_wiki",
    "searchsorted_in_segments",
    "contains_in_segments",
]
