"""Embedding backend API: the reference's ``Node2VecBase`` surface on TPU.

Mirrors ``/root/reference/node2vec/embedding.py``: an abstract base declaring
``fit/embedding/get_vector/save_model/load_model`` (``embedding.py:22-66``)
and a concrete trainer backend with ``save_vectors/load_vectors``
(``embedding.py:70-178``).  The gensim/spark.ml engines are replaced by the
jit-compiled SGNS trainer (node2vec_tpu.models.word2vec); vectors round-trip
through npz (model) and the word2vec text format (vectors) so they
interoperate with gensim's ``KeyedVectors.load_word2vec_format``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional, Union

import numpy as np
import pandas as pd

from node2vec_tpu.constants import Word2VecParams
from node2vec_tpu.models.word2vec import Word2VecTPU


class Node2VecBase:
    """Abstract embedding-backend contract (reference embedding.py:22-66)."""

    def fit(self):
        raise NotImplementedError()

    def embedding(self):
        raise NotImplementedError()

    def get_vector(self, vertex_name: Union[str, int]):
        raise NotImplementedError()

    def save_model(self, cloud_path: str, model_name: str):
        raise NotImplementedError()

    def load_model(self, cloud_path: str, model_name: str):
        raise NotImplementedError()


def _as_name_id(
    name_id: Optional[Union[pd.DataFrame, Mapping[int, Any], np.ndarray]],
) -> Optional[Dict[int, Any]]:
    """Normalize a name<->id table into {id: name} (reference embedding.py:129-143)."""
    if name_id is None:
        return None
    if isinstance(name_id, pd.DataFrame):
        return dict(zip(name_id["id"].astype(int), name_id["name"]))
    if isinstance(name_id, np.ndarray):
        return dict(enumerate(name_id))
    return {int(k): v for k, v in name_id.items()}


class Node2VecTPUEmbedding(Node2VecBase):
    """SGNS embedding backend (the reference's Node2VecGensim analogue).

    Args:
      df_walks: walk corpus — int32 array [N, L+1] (-1 padded) or a DataFrame
        with a ``walk`` column of id lists (the reference's finished-walk rows,
        ``randomwalk.py:343-349``).
      name_id: optional id->name mapping (DataFrame[name,id], array, or dict).
      w2v_params: Word2VecParams or reference-style dict (gensim/spark keys ok).
    """

    MODEL_SUFFIX = ".npz"

    def __init__(
        self,
        df_walks=None,
        name_id=None,
        w2v_params: Optional[Union[Word2VecParams, Mapping[str, Any]]] = None,
        shared_negatives: int = 64,
    ):
        if isinstance(w2v_params, Word2VecParams):
            self.params = w2v_params
        else:
            self.params = Word2VecParams.from_dict(w2v_params)
        self.name_id = _as_name_id(name_id)
        self.walks = self._as_walks(df_walks)
        self.model = Word2VecTPU(self.params, shared_negatives=shared_negatives)

    @staticmethod
    def _as_walks(df_walks) -> Optional[np.ndarray]:
        if df_walks is None:
            return None
        if isinstance(df_walks, pd.DataFrame):
            col = "walk" if "walk" in df_walks.columns else df_walks.columns[-1]
            seqs = [np.asarray(w, dtype=np.int64) for w in df_walks[col]]
            length = max(len(s) for s in seqs)
            out = np.full((len(seqs), length), -1, dtype=np.int32)
            for i, s in enumerate(seqs):
                out[i, : len(s)] = s
            return out
        return np.asarray(df_walks, dtype=np.int32)

    def fit(self, verbose: bool = False) -> Word2VecTPU:
        if self.walks is None:
            raise ValueError("No walks provided to fit()")
        self.model.fit(self.walks, verbose=verbose)
        return self.model

    def _check_fitted(self):
        if self.model.emb_in is None:
            raise RuntimeError("model not fitted; call fit() first")

    def embedding(self) -> pd.DataFrame:
        """Per-vertex vectors as DataFrame[name, vector], names mapped back via
        name_id when available (reference embedding.py:129-143)."""
        self._check_fitted()
        vocab_ids = np.nonzero(self.model.vocab.mask)[0]
        vectors = self.model.vectors[vocab_ids]
        if self.name_id is not None:
            names = [self.name_id[int(i)] for i in vocab_ids]
        else:
            names = vocab_ids.tolist()
        return pd.DataFrame({"name": names, "vector": list(vectors)})

    def get_vector(self, vertex_name: Union[str, int]) -> np.ndarray:
        self._check_fitted()
        if self.name_id is not None and not isinstance(vertex_name, (int, np.integer)):
            if getattr(self, "_name_to_id", None) is None:
                # built once; reference rebuilds nothing because spark keeps a
                # DataFrame join — here the map lives with the model
                self._name_to_id = {v: k for k, v in self.name_id.items()}
            if vertex_name not in self._name_to_id:
                raise KeyError(f"Unknown vertex name: {vertex_name!r}")
            vid = self._name_to_id[vertex_name]
        else:
            vid = int(vertex_name)
        return self.model.vector(vid)

    # -- persistence ------------------------------------------------------- #

    def save_model(self, cloud_path: str, model_name: str) -> None:
        """Full model state (both tables + accumulators + vocab) as npz."""
        self._check_fitted()
        if not model_name.endswith(self.MODEL_SUFFIX):
            model_name += self.MODEL_SUFFIX
        os.makedirs(cloud_path, exist_ok=True)
        names = (
            np.array([self.name_id.get(i, i) for i in range(len(self.model.vectors))])
            if self.name_id is not None
            else np.array([])
        )
        np.savez_compressed(
            os.path.join(cloud_path, model_name),
            emb_in=self.model.emb_in,
            emb_out=self.model.emb_out,
            counts=self.model.vocab.counts,
            mask=self.model.vocab.mask,
            names=names,
        )

    def load_model(self, cloud_path: str, model_name: str) -> Word2VecTPU:
        if not model_name.endswith(self.MODEL_SUFFIX):
            model_name += self.MODEL_SUFFIX
        z = np.load(os.path.join(cloud_path, model_name), allow_pickle=True)
        from node2vec_tpu.models.vocab import build_vocab_from_counts

        self.model.emb_in = z["emb_in"]
        self.model.emb_out = z["emb_out"]
        # rebuild the vocabulary (mask + noise alias table) from the saved
        # counts — one construction path, not a drifting inline copy
        self.model.vocab = build_vocab_from_counts(
            z["counts"],
            min_count=self.params.min_count,
            ns_exponent=self.params.ns_exponent,
        )
        if len(z["names"]):
            self.name_id = dict(enumerate(z["names"]))
        return self.model

    def save_vectors(self, cloud_path: str, file_name: str) -> None:
        """word2vec text format (gensim KeyedVectors-compatible):
        header 'count dim', then 'name v1 v2 ...' per line."""
        self._check_fitted()
        os.makedirs(cloud_path, exist_ok=True)
        vocab_ids = np.nonzero(self.model.vocab.mask)[0]
        vectors = self.model.vectors
        dim = vectors.shape[1]
        with open(os.path.join(cloud_path, file_name), "w") as f:
            f.write(f"{len(vocab_ids)} {dim}\n")
            for vid in vocab_ids:
                name = self.name_id[int(vid)] if self.name_id is not None else vid
                vec = " ".join(f"{x:.6g}" for x in vectors[vid])
                f.write(f"{name} {vec}\n")

    def load_vectors(self, cloud_path: str, file_name: str) -> pd.DataFrame:
        names, vecs = [], []
        with open(os.path.join(cloud_path, file_name)) as f:
            header = f.readline().split()
            count, dim = int(header[0]), int(header[1])
            for line in f:
                parts = line.rstrip("\n").split(" ")
                names.append(parts[0])
                vecs.append(np.array(parts[1:], dtype=np.float32))
        if len(names) != count or (vecs and len(vecs[0]) != dim):
            raise ValueError("corrupt word2vec-format vector file")
        return pd.DataFrame({"name": names, "vector": vecs})
