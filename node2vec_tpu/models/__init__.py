from node2vec_tpu.models.vocab import Vocabulary, build_vocab
from node2vec_tpu.models.skipgram import init_embeddings, sgns_train_step
from node2vec_tpu.models.word2vec import Word2VecTPU

__all__ = [
    "Vocabulary",
    "build_vocab",
    "init_embeddings",
    "sgns_train_step",
    "Word2VecTPU",
]
