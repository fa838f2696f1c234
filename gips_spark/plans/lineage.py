"""Per-partition lineage + idempotent resume (BASELINE.json north_rule).

Protocol
--------
A *stage* is a deterministic function `input DF → output DF` plus a
stable record key.  Work is split into ``n_buckets`` hash buckets of the
key (``bucket = pmod(xxhash64(key), n)``).  Each completed bucket gets a
lineage row:

    run_id, stage, bucket, cell_lo, cell_hi, row_count, checksum, wall_ms

written to ``<out>/_lineage`` after the bucket's output parquet lands in
``<out>/data/bucket=<b>/``.  On resume the driver anti-joins the bucket
list against existing lineage (SURVEY.md §2.3 J8 — the reference's
skip-existing `Data.process` overwrite check): only missing buckets are
recomputed and dynamically overwritten, so

* re-run with complete lineage  → zero new work,
* delete some buckets' data+lineage → only those are recomputed,
  byte-identical (stage determinism is what goldens pin down).

The checksum is order-insensitive: sum of per-row xxhash64 over the
output columns, as decimal(38,0) so no overflow ambiguity.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = [
    "run_id",
    "stage",
    "bucket",
    "cell_lo",
    "cell_hi",
    "row_count",
    "checksum",
    "wall_ms",
]


def bucket_of(key_col, n_buckets: int):
    return F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int")


def _checksum_col(df: DataFrame):
    cols = [F.col(c) for c in sorted(df.columns) if c != "bucket"]
    return F.sum(F.xxhash64(*cols).cast("decimal(38,0)"))


def read_lineage(spark: SparkSession, out_path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(f"{out_path}/_lineage")
    except Exception:
        return None


def completed_buckets(spark: SparkSession, out_path: str, stage: str) -> set[int]:
    lin = read_lineage(spark, out_path)
    if lin is None:
        return set()
    rows = lin.where(F.col("stage") == stage).select("bucket").distinct().collect()
    return {r["bucket"] for r in rows}


def run_stage(
    spark: SparkSession,
    stage: str,
    run_id: str,
    in_df: DataFrame,
    transform,
    key_col: str,
    out_path: str,
    n_buckets: int = 32,
    cell_col: str | None = None,
) -> dict:
    """Run `transform` incrementally over hash buckets of `key_col`.

    Returns a metrics dict (rows, wall_ms, buckets_run, rows_per_sec,
    skew_ratio over bucket row counts).
    """
    done = completed_buckets(spark, out_path, stage)
    todo = [b for b in range(n_buckets) if b not in done]
    t0 = time.monotonic()
    if not todo:
        return {
            "stage": stage,
            "run_id": run_id,
            "rows": 0,
            "buckets_run": 0,
            "wall_ms": 0,
            "rows_per_sec": 0.0,
            "resumed": True,
        }

    bucketed = in_df.withColumn("bucket", bucket_of(F.col(key_col), n_buckets))
    if len(todo) < n_buckets:
        bucketed = bucketed.where(F.col("bucket").isin(todo))
    out = transform(bucketed)
    if "bucket" not in out.columns:
        out = out.withColumn("bucket", bucket_of(F.col(key_col), n_buckets))

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out.write.mode("overwrite").partitionBy("bucket").parquet(f"{out_path}/data")
    wall_ms = int((time.monotonic() - t0) * 1000)

    # manifest over what was just written (read back → exactly what's on disk)
    written = spark.read.parquet(f"{out_path}/data").where(
        F.col("bucket").isin(todo)
    )
    cell = F.col(cell_col) if cell_col and cell_col in written.columns else F.lit(None)
    agg = written.groupBy("bucket").agg(
        F.min(cell).alias("cell_lo"),
        F.max(cell).alias("cell_hi"),
        F.count(F.lit(1)).alias("row_count"),
        _checksum_col(written).cast("string").alias("checksum"),
    )
    # buckets whose output is EMPTY still get a manifest row (row_count
    # 0, checksum '0') — otherwise they are never marked complete and
    # every resume recomputes them (ADVICE r1).
    todo_df = spark.createDataFrame([(int(b),) for b in todo], "bucket int")
    manifest = (
        todo_df.join(agg, "bucket", "left")
        .withColumn("row_count", F.coalesce(F.col("row_count"), F.lit(0)))
        .withColumn("checksum", F.coalesce(F.col("checksum"), F.lit("0")))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("stage", F.lit(stage))
        .withColumn("wall_ms", F.lit(wall_ms))
        .select(*LINEAGE_COLS)
    )
    manifest.write.mode("append").parquet(f"{out_path}/_lineage")

    counts = [r["row_count"] for r in manifest.select("row_count").collect()]
    rows = sum(counts)
    med = sorted(counts)[len(counts) // 2] if counts else 0
    return {
        "stage": stage,
        "run_id": run_id,
        "rows": rows,
        "buckets_run": len(todo),
        "wall_ms": wall_ms,
        "rows_per_sec": rows / (wall_ms / 1000.0) if wall_ms else 0.0,
        "skew_ratio": (max(counts) / med) if med else 1.0,
        "resumed": False,
    }
