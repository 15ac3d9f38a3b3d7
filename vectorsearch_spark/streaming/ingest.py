"""Structured Streaming ingest into the segmented vector index.

The reference has no streaming engine — its closest analog is the async
build/maintenance task pipeline (tasks/SegmentBuildWorker.java:39-55,
tasks/GlobalWorkerRunner.java:90-123): writers append to the ACTIVE
segment, rotation enqueues a build task, workers seal in the
background. The Spark-native re-expression is ``readStream`` →
``foreachBatch``: every micro-batch is one transactional ``add``
(dense gids, strict-cap rotation), and segments that rotate to PENDING
are optionally built+sealed inline — micro-batches ARE the task queue,
with exactly-once bookkeeping from checkpointing + the idempotent
registry.

Scale: each micro-batch append is the same partition-parallel job as
batch ingest; build work is bounded per batch (only segments filled by
that batch). Driver state stays O(#segments).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from vectorsearch_spark.index.catalog import VectorIndex


def stream_add(
    index: VectorIndex,
    stream_df: DataFrame,
    embedding_col: str = "embedding",
    payload_col: str | None = None,
    order_col: str | None = None,
    build_on_rotate: bool = True,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    on_batch: Callable[[int, int], None] | None = None,
) -> StreamingQuery:
    """Continuously append a streaming DataFrame into the index.

    Each micro-batch runs the batch ``add`` (gid allocation + rotation),
    then — when ``build_on_rotate`` — builds/seals any segment the batch
    filled, mirroring the reference's enqueue-build-on-rotation
    (fdb/FdbVectorStore.java:512-539 → enqueueBuildTask at 723-727).

    Returns the started StreamingQuery; callers own its lifecycle
    (``awaitTermination`` / ``stop``). ``trigger`` kwargs pass through,
    e.g. ``{"availableNow": True}`` for drain-and-stop or
    ``{"processingTime": "10 seconds"}``.
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        first = index.add(
            batch_df,
            embedding_col=embedding_col,
            payload_col=payload_col,
            order_col=order_col,
        )
        n_built = 0
        if build_on_rotate:
            n_built = len(index.build())
        if on_batch is not None:
            on_batch(epoch_id, n_built)
        _ = first

    writer = stream_df.writeStream.foreachBatch(process).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
