from node2vec_tpu.graph.csr import Graph, DeviceGraph, build_csr, mirror_dedup, from_edge_arrays
from node2vec_tpu.graph.indexer import index_edges, index_graph_pandas
from node2vec_tpu.graph.trim import trim_hotspot_edges
from node2vec_tpu.graph.ingest import build_graph

__all__ = [
    "Graph",
    "DeviceGraph",
    "build_csr",
    "mirror_dedup",
    "from_edge_arrays",
    "index_edges",
    "index_graph_pandas",
    "trim_hotspot_edges",
    "build_graph",
]
