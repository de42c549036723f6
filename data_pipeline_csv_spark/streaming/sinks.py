"""Streaming sinks: foreachBatch parquet upsert + memory (tests)."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def foreach_batch_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint: str, mode: str = "append"
) -> StreamingQuery:
    """Run a stream into parquet via foreachBatch.

    foreachBatch gives exactly-once-per-epoch batch semantics: the
    epoch id makes the write idempotent on retry (overwrite-by-epoch
    partition), and the batch DataFrame accepts any batch writer —
    the escape hatch for sinks with no native streaming support
    (JDBC, upserts).
    """

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode(mode).parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        stream_df.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def run_to_memory(
    stream_df: DataFrame,
    spark: SparkSession,
    output_mode: str = "update",
    name: str | None = None,
) -> DataFrame:
    """Drain a bounded stream into the memory sink; return the result table.

    Test-only: processAllAvailable blocks until every staged file is
    consumed, then the in-memory table holds the full output. With
    output_mode="update" the table may hold multiple versions of a
    key — callers take the latest by a monotonic column when needed.
    """
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
