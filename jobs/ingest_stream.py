"""Streaming incremental corpus dedup (round 5): Structured Streaming
micro-batches driving the lineage-resumable ingest job.

Each micro-batch runs ``jobs.ingest_batch.ingest_batch`` with
``batch_id = epoch<id>`` — so the streaming path and the daily-batch
path share ONE implementation of dedup-against-the-index, bucketed
appends, and per-bucket lineage.  Exactly-once under replay comes from
the job's idempotency model, not sink transactions: a re-delivered
epoch rewrites its OWN (batch, bucket) partitions via dynamic partition
overwrite and its lineage rows mark completed work, so duplicates
cannot accumulate no matter how many times foreachBatch retries.

Cluster shape: readStream from the landing zone (files/Kafka/Iceberg
CDC), foreachBatch → ingest_batch(root on HDFS/S3).  Sandbox test:
file source + Trigger.AvailableNow (same pattern as
gips_spark/streaming/ingest.py).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.ingest_batch import ingest_batch  # noqa: E402

DOCS_DDL = "doc_id bigint, text string"


def read_docs_stream(spark: SparkSession, path: str, files_per_trigger: int = 1):
    return (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


def run_ingest_stream_available_now(
    spark: SparkSession,
    in_path: str,
    root: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8,
) -> list[dict]:
    """Drain the landing zone into the corpus at `root`; returns the
    per-epoch ingest metrics (driver-side list, test/ops surface)."""
    metrics: list[dict] = []

    def _sink(bdf, epoch_id: int):
        if not bdf.isEmpty():
            m = ingest_batch(
                bdf.sparkSession,
                bdf,
                f"epoch{epoch_id:06d}",
                root,
                id_col=id_col,
                text_col=text_col,
                n_buckets=n_buckets,
            )
            metrics.append(m)

    q = (
        read_docs_stream(spark, in_path)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return metrics
