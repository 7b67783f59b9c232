"""Top-level driver: the reference's ``Node2VecSpark`` surface, TPU-native.

Mirrors the whole-pipeline driver class (``/root/reference/node2vec/spark.py:
401-677``) and the fugue functional forms ``trim_index``/``random_walk``
(``fugue.py:24-155``): preprocess -> random_walk -> fit -> embedding, plus
model persistence — every stage backed by the TPU engine instead of Spark.
"""

from __future__ import annotations

import logging
from typing import Any, Mapping, Optional, Tuple, Union

import numpy as np
import pandas as pd

from node2vec_tpu.constants import (
    MAX_OUT_DEGREES,
    Node2VecParams,
    Word2VecParams,
)
from node2vec_tpu.embedding import Node2VecTPUEmbedding
from node2vec_tpu.graph import Graph, build_graph
from node2vec_tpu.graph.indexer import index_graph_pandas
from node2vec_tpu.graph.trim import trim_hotspot_edges
from node2vec_tpu.models.word2vec import Word2VecTPU
from node2vec_tpu.walk import WalkEngine
from node2vec_tpu.walk.engine import random_walks as _random_walks_fn

logger = logging.getLogger(__name__)


class Node2Vec:
    """End-to-end node2vec on TPU (reference ``Node2VecSpark`` analogue).

    >>> n2v = Node2Vec(n2v_params={"num_walks": 10, "walk_length": 20})
    >>> n2v.preprocess_input_graph(df, indexed=False, directed=False)
    >>> n2v.random_walk()
    >>> n2v.fit()
    >>> df_emb = n2v.embedding()
    """

    def __init__(
        self,
        n2v_params: Optional[Union[Node2VecParams, Mapping[str, Any]]] = None,
        w2v_params: Optional[Union[Word2VecParams, Mapping[str, Any]]] = None,
        max_out_degree: int = 0,
        random_seed: Optional[int] = None,
        profile: str = "fugue",
        checkpoint_dir: Optional[str] = None,
        walk_seed_vertices: Optional[np.ndarray] = None,
        mesh=None,
        graph_sharded: bool = False,
        table_sharding: str = "column",
        shared_lists="auto",
        host_corpus: bool = False,
    ):
        """``mesh``: optional jax (data × model) Mesh — walks shard walkers
        over 'data' and fit() trains TP×DP sharded (see node2vec_tpu.parallel).

        ``graph_sharded=True`` (requires mesh): the adjacency itself is
        range-partitioned across devices — each device holds only its vertex
        range and walk supersteps exchange sampling requests via all-to-all
        (the layout for graphs beyond one device's HBM).

        ``table_sharding`` (mesh training only): ``"column"`` keeps a full
        embedding-table replica per data shard (TP columns, bit-matches the
        single-device trainer under TP-only meshes); ``"row"`` mod-shards
        rows over all devices with sparse all-to-all gradient routing —
        per-step comm O(batch·D) independent of V, for tables beyond one
        device's HBM.

        ``shared_lists``: the blocked engine's exact 3-atom shared-list
        sampler (opt-in; see WalkEngine docstring for the measured
        trade-off).

        ``host_corpus=True`` (single-device only): the walk corpus lives in
        HOST RAM and training streams globally-shuffled slabs to the device
        double-buffered (Word2VecTPU.fit_host).  The single-chip
        configuration for the reference's flagship workload — num_walks=10 ×
        dim 128 at 100M+ edges — where corpus + tables exceed one chip's HBM
        (fit() keeps both resident; fit_streaming keeps the graph resident).
        """
        if table_sharding not in ("column", "row"):
            raise ValueError(
                f"table_sharding must be 'column' or 'row', got {table_sharding!r}"
            )
        if isinstance(n2v_params, Node2VecParams):
            self.n2v_params = n2v_params
        else:
            self.n2v_params = Node2VecParams.from_dict(n2v_params, profile=profile)
        if isinstance(w2v_params, Word2VecParams):
            self.w2v_params = w2v_params
        else:
            self.w2v_params = Word2VecParams.from_dict(w2v_params)
        self.max_out_degree = max_out_degree or MAX_OUT_DEGREES
        self.random_seed = random_seed if random_seed is not None else 0
        self.checkpoint_dir = checkpoint_dir
        self.walk_seed_vertices = walk_seed_vertices
        self.mesh = mesh
        self.graph_sharded = graph_sharded
        self.table_sharding = table_sharding
        self.shared_lists = shared_lists
        if host_corpus and mesh is not None:
            raise ValueError(
                "host_corpus is the single-device trainer path; on a mesh "
                "use table_sharding='row' (+ streaming) instead"
            )
        self.host_corpus = host_corpus
        self.graph: Optional[Graph] = None
        self.walks: Optional[np.ndarray] = None
        self.backend: Optional[Node2VecTPUEmbedding] = None
        self._engine = None  # cached WalkEngine (graph tables are reusable)

    # -- pipeline stages ---------------------------------------------------- #

    def preprocess_input_graph(
        self,
        data,
        indexed: bool = True,
        directed: bool = True,
        log1p_weight: bool = False,
    ) -> Graph:
        """Validate/index/trim and build the CSR graph
        (reference spark.py:470-534)."""
        self.graph = build_graph(
            data,
            indexed=indexed,
            directed=directed,
            max_out_degree=self.max_out_degree,
            random_seed=self.random_seed,
            log1p_weight=log1p_weight,
        )
        self._engine = None  # packed tables belong to the previous graph
        logger.info(
            "graph preprocessed: %d vertices, %d edges",
            self.graph.n_vertices,
            self.graph.n_edges,
        )
        return self.graph

    def _walk_engine(self) -> WalkEngine:
        """Build once, reuse: the packed tables (and the shared-list
        table, ~15s of host work per 8M edges when opted in) are p/q/seed
        independent, so random_walk() and run_pipeline() share one engine."""
        if self._engine is None:
            self._engine = WalkEngine(
                self.graph, self.n2v_params, mesh=self.mesh,
                graph_sharded=self.graph_sharded,
                shared_lists=self.shared_lists,
            )
        return self._engine

    def _stream_source_token(self, engine: WalkEngine) -> str:
        """Identity of the virtual walk corpus for streaming-checkpoint
        fingerprints: graph content + walk params + seed + engine/sampler."""
        starts = self.walk_seed_vertices
        return (
            f"{engine.graph_token}|{self.n2v_params!r}|{self.random_seed}|"
            f"{engine._strategy_token()}|"
            f"{None if starts is None else list(map(int, starts))}"
        )

    def random_walk(self) -> np.ndarray:
        """Generate the walk corpus (reference spark.py:536-614)."""
        if self.graph is None:
            raise RuntimeError("call preprocess_input_graph() first")
        engine = self._walk_engine()
        self.walks = engine.run(
            seed=self.random_seed,
            start_vertices=self.walk_seed_vertices,
            checkpoint_dir=self.checkpoint_dir,
        )
        logger.info("random walks done: %s", self.walks.shape)
        return self.walks

    def run_pipeline(
        self, verbose: bool = False, streaming: Optional[bool] = None
    ) -> Word2VecTPU:
        """walks + training without the corpus ever leaving the device.

        Equivalent to random_walk() followed by fit(), minus the host
        round-trip of the walk corpus (the reference cannot avoid it: gensim
        pulls the whole corpus into driver RAM, embedding.py:125).

        ``streaming`` (default: auto — on when the corpus spans multiple
        walker chunks): train over a VIRTUAL corpus — walk chunks regenerate
        deterministically on device per epoch, chunk k+1 dispatching while
        chunk k trains (producer/consumer overlap), and the full corpus never
        exists in memory.  Removes the HBM corpus-size ceiling entirely.
        """
        if self.graph is None:
            raise RuntimeError("call preprocess_input_graph() first")
        engine = self._walk_engine()
        name_id = self.graph.names if self.graph.names is not None else None
        self.backend = Node2VecTPUEmbedding(name_id=name_id, w2v_params=self.w2v_params)
        if self.host_corpus:
            # walk to HOST RAM (pipelined striped readback), free the
            # engine's device graph tables, then stream slabs back during
            # training — corpus + tables never coexist in HBM
            self.walks = engine.run(
                seed=self.random_seed,
                start_vertices=self.walk_seed_vertices,
                checkpoint_dir=self.checkpoint_dir,
            )
            self._engine = None  # release the device graph tables
            import gc

            del engine
            gc.collect()
            self.backend.model.fit_host(
                self.walks, n_vertices=self.graph.n_vertices, verbose=verbose,
                checkpoint_dir=self.checkpoint_dir,
            )
            self.backend.walks = self.walks
            return self.backend.model
        n_chunks, chunk_walks, source = engine.chunk_source(
            seed=self.random_seed, start_vertices=self.walk_seed_vertices
        )
        if streaming is None:
            # auto: stream whenever the corpus spans multiple chunks; the
            # mesh path streams too when the table layout supports it (row).
            # Both streaming trainers checkpoint/resume train state when
            # checkpoint_dir is set (chunk-boundary snapshots).
            streaming = n_chunks > 1 and (
                self.mesh is None or self.table_sharding == "row"
            )
        if streaming and self.mesh is None:
            self.backend.model.fit_streaming(
                source, n_chunks, self.graph.n_vertices, verbose=verbose,
                checkpoint_dir=self.checkpoint_dir,
                source_token=self._stream_source_token(engine),
            )
            self.walks = None  # virtual corpus: regenerate via random_walk()
            return self.backend.model
        if streaming:
            # streaming × row-sharded: unbounded corpus AND V beyond one
            # device's HBM — chunks stay mesh-sharded end to end
            self.backend.model.fit_streaming_sharded(
                source, n_chunks, self.mesh, self.graph.n_vertices,
                table_sharding=self.table_sharding, verbose=verbose,
                checkpoint_dir=self.checkpoint_dir,
                source_token=self._stream_source_token(engine),
            )
            self.walks = None
            return self.backend.model
        walks_dev = engine.run_device(
            seed=self.random_seed, start_vertices=self.walk_seed_vertices
        )
        if self.mesh is not None:
            # sharded trainer consumes a host corpus (sharded batches per step)
            self.backend.model.fit_sharded(
                np.asarray(walks_dev), self.mesh,
                n_vertices=self.graph.n_vertices, verbose=verbose,
                table_sharding=self.table_sharding,
                checkpoint_dir=self.checkpoint_dir,
            )
        else:
            self.backend.model.fit(
                walks_dev, n_vertices=self.graph.n_vertices, verbose=verbose,
                checkpoint_dir=self.checkpoint_dir,
            )
        self.walks = np.asarray(walks_dev)
        return self.backend.model

    def fit(self, verbose: bool = False) -> Word2VecTPU:
        """Train embeddings over the walks (reference spark.py:616-631)."""
        if self.walks is None:
            raise RuntimeError("call random_walk() first")
        name_id = None
        if self.graph is not None and self.graph.names is not None:
            name_id = self.graph.names
        self.backend = Node2VecTPUEmbedding(
            df_walks=self.walks, name_id=name_id, w2v_params=self.w2v_params
        )
        # vocabulary covers every graph vertex even if rare ones fall below
        # min_count (they are masked, not renumbered)
        n_v = self.graph.n_vertices if self.graph else None
        if self.mesh is not None:
            self.backend.model.fit_sharded(
                self.walks, self.mesh, n_vertices=n_v, verbose=verbose,
                table_sharding=self.table_sharding,
                checkpoint_dir=self.checkpoint_dir,
            )
        elif self.host_corpus:
            self.backend.model.fit_host(
                self.walks,
                n_vertices=n_v,
                verbose=verbose,
                checkpoint_dir=self.checkpoint_dir,
            )
        else:
            self.backend.model.fit(
                self.walks,
                n_vertices=n_v,
                verbose=verbose,
                checkpoint_dir=self.checkpoint_dir,
            )
        return self.backend.model

    def embedding(self) -> pd.DataFrame:
        """Vectors mapped back to original names (reference spark.py:633-643)."""
        if self.backend is None:
            raise RuntimeError("model not fitted yet!")
        return self.backend.embedding()

    def get_vector(self, vertex_name: Union[str, int]) -> np.ndarray:
        if self.backend is None:
            raise RuntimeError("model not fitted yet!")
        return self.backend.get_vector(vertex_name)

    # -- persistence -------------------------------------------------------- #

    def save_model(self, cloud_path: str, model_name: str) -> None:
        if self.backend is None:
            raise RuntimeError("model not fitted yet!")
        self.backend.save_model(cloud_path, model_name)

    def load_model(self, cloud_path: str, model_name: str) -> Word2VecTPU:
        if self.backend is None:
            self.backend = Node2VecTPUEmbedding(w2v_params=self.w2v_params)
        return self.backend.load_model(cloud_path, model_name)

    def save_vectors(self, cloud_path: str, file_name: str) -> None:
        if self.backend is None:
            raise RuntimeError("model not fitted yet!")
        self.backend.save_vectors(cloud_path, file_name)

    def load_vectors(self, cloud_path: str, file_name: str) -> pd.DataFrame:
        if self.backend is None:
            self.backend = Node2VecTPUEmbedding(w2v_params=self.w2v_params)
        return self.backend.load_vectors(cloud_path, file_name)


# --------------------------------------------------------------------------- #
# Functional forms (reference fugue.py surface)
# --------------------------------------------------------------------------- #


def trim_index(
    df: pd.DataFrame,
    indexed: bool = False,
    directed: bool = False,
    max_out_deg: int = 0,
    random_seed: Optional[int] = None,
) -> Tuple[pd.DataFrame, Optional[pd.DataFrame]]:
    """Trim hotspot vertices then index: reference ``fugue.py:24-77``.

    Returns (edges df with int ids, name_id df or None).  Fugue ordering:
    trim first on the raw edges, then index (+mirror if undirected).
    """
    if "src" not in df.columns or "dst" not in df.columns:
        raise ValueError(f"Input graph NOT in the right format: {list(df.columns)}")
    w = df["weight"].to_numpy() if "weight" in df.columns else None
    src, dst, w = trim_hotspot_edges(
        df["src"].to_numpy(), df["dst"].to_numpy(), w, max_out_deg, random_seed
    )
    trimmed = pd.DataFrame({"src": src, "dst": dst})
    if w is not None:
        trimmed["weight"] = w
    edges, name_id = index_graph_pandas(trimmed, indexed=indexed)
    if not directed:
        from node2vec_tpu.graph.csr import mirror_dedup

        s, d, wt = mirror_dedup(
            edges["src"].to_numpy(), edges["dst"].to_numpy(), edges["weight"].to_numpy()
        )
        edges = pd.DataFrame({"src": s, "dst": d, "weight": wt})
    return edges, name_id


def random_walk(
    df: Union[pd.DataFrame, Graph],
    n2v_params: Optional[Mapping[str, Any]] = None,
    walk_seed: Optional[np.ndarray] = None,
    random_seed: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
) -> pd.DataFrame:
    """Walk corpus as DataFrame[src, walk]: reference ``fugue.py:81-155``.

    Accepts an indexed edge DataFrame (src/dst[/weight] int columns) or a
    prebuilt Graph.
    """
    if isinstance(df, Graph):
        graph = df
    else:
        graph = build_graph(df, indexed=True, directed=True)
    params = (
        n2v_params
        if isinstance(n2v_params, Node2VecParams)
        else Node2VecParams.from_dict(n2v_params)
    )
    walks = _random_walks_fn(
        graph,
        params,
        seed=random_seed if random_seed is not None else 0,
        start_vertices=walk_seed,
        checkpoint_dir=checkpoint_dir,
    )
    return pd.DataFrame(
        {"src": walks[:, 0], "walk": [row[row >= 0].tolist() for row in walks]}
    )
