from vectorsearch_spark.index.catalog import SearchParams, VectorIndex

__all__ = ["SearchParams", "VectorIndex"]
