from vectorsearch_spark.operators.dedup import (
    benchmark_overlap,
    embedding_near_dup,
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from vectorsearch_spark.operators.events import asof_join
from vectorsearch_spark.operators.knn import brute_force_topk, knn_join, knn_join_expr
from vectorsearch_spark.operators.multimodal import (
    attach_media_metadata,
    extract_features,
    resize_images,
    sample_frames,
)
from vectorsearch_spark.operators.similarity import (
    ann_ivf_join,
    ann_lsh_join,
    ivf_assign,
    train_ivf_centroids,
)
from vectorsearch_spark.operators.text import (
    doc_stats,
    fingerprint,
    language_id,
    pii_scan,
    repetition_stats,
    simhash_fingerprints,
    winnow_fingerprints,
)

__all__ = [
    "ann_ivf_join",
    "ann_lsh_join",
    "asof_join",
    "attach_media_metadata",
    "benchmark_overlap",
    "brute_force_topk",
    "doc_stats",
    "embedding_near_dup",
    "exact_duplicates",
    "extract_features",
    "fingerprint",
    "ivf_assign",
    "jaccard_pairs",
    "knn_join",
    "knn_join_expr",
    "language_id",
    "minhash_lsh_pairs",
    "pii_scan",
    "repetition_stats",
    "resize_images",
    "sample_frames",
    "simhash_fingerprints",
    "simhash_pairs",
    "train_ivf_centroids",
    "winnow_fingerprints",
]
