"""TPU-native node2vec: graph embedding at TPU speed.

A from-scratch JAX/XLA/Pallas reimplementation of the node2vec pipeline with
the same capability surface as the Spark/Fugue reference
(``graph-embedding/node2vec``; see SURVEY.md): hotspot-trimmed ingest, vertex
indexing, second-order p/q-biased random walks, and skip-gram embedding
training — architected for TPU hardware instead of a Spark cluster.
"""

__version__ = "0.1.0"

from node2vec_tpu.constants import (
    MAX_OUT_DEGREES,
    NODE2VEC_PARAMS,
    WORD2VEC_PARAMS,
    GENSIM_PARAMS,
    Node2VecParams,
    Word2VecParams,
)
from node2vec_tpu.graph import Graph, build_graph
from node2vec_tpu.api import Node2Vec, trim_index, random_walk
from node2vec_tpu.embedding import Node2VecBase, Node2VecTPUEmbedding
from node2vec_tpu.models.word2vec import Word2VecTPU
from node2vec_tpu.walk import WalkEngine, random_walks

__all__ = [
    "Node2Vec",
    "trim_index",
    "random_walk",
    "Node2VecBase",
    "Node2VecTPUEmbedding",
    "Word2VecTPU",
    "WalkEngine",
    "random_walks",
    "__version__",
    "MAX_OUT_DEGREES",
    "NODE2VEC_PARAMS",
    "WORD2VEC_PARAMS",
    "GENSIM_PARAMS",
    "Node2VecParams",
    "Word2VecParams",
    "Graph",
    "build_graph",
]
