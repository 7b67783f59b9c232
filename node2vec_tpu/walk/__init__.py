from node2vec_tpu.walk.engine import WalkEngine, random_walks

__all__ = ["WalkEngine", "random_walks"]
