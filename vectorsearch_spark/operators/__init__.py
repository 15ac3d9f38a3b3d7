from vectorsearch_spark.operators.knn import brute_force_topk, knn_join, knn_join_expr

__all__ = ["brute_force_topk", "knn_join", "knn_join_expr"]
