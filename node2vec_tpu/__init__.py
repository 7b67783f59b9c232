"""TPU-native node2vec: graph embedding at TPU speed.

A from-scratch JAX/XLA/Pallas reimplementation of the node2vec pipeline with
the same capability surface as the Spark/Fugue reference
(``graph-embedding/node2vec``; see SURVEY.md): hotspot-trimmed ingest, vertex
indexing, second-order p/q-biased random walks, and skip-gram embedding
training — architected for TPU hardware instead of a Spark cluster.
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache() -> None:
    """Point JAX at a persistent compilation cache unless the user already
    configured one.  Cold kernel compiles through a remote-compile service can
    take minutes when the service itself is cold (measured: 2s warm vs 359s
    for an identical kernel on a cold helper); caching compiled executables on
    disk makes every surface (CLI, examples, bench, library use) pay that at
    most once per kernel shape.  Opt out with NODE2VEC_TPU_NO_CACHE=1.
    """
    import os

    if os.environ.get("NODE2VEC_TPU_NO_CACHE"):
        return
    try:
        import jax

        if (
            jax.config.jax_compilation_cache_dir is None
            and "JAX_COMPILATION_CACHE_DIR" not in os.environ
        ):
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "node2vec_tpu", "jax"
            )
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization; never block import on it
        pass


_enable_persistent_compile_cache()

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
