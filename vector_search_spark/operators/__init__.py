from .knn import knn_topk, score_by_dot, similarity_join

__all__ = ["knn_topk", "score_by_dot", "similarity_join"]
