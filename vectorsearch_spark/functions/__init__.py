from vectorsearch_spark.functions.distances import (
    cosine,
    distance_for_metric,
    dot,
    l2,
    l2_squared,
    norm,
    normalize,
    score_for_metric,
)

__all__ = [
    "cosine",
    "distance_for_metric",
    "dot",
    "l2",
    "l2_squared",
    "norm",
    "normalize",
    "score_for_metric",
]
