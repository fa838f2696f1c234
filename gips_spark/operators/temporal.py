"""Temporal resample / gap-fill / interpolation / sessionization — the
hypertable-rollup family for irregular event streams.

Reference parity: the reference's temporal products are defined on a
REGULAR calendar grid built from irregular acquisitions
(`gips/data/core.py :: Data.process` interval products, SURVEY.md §2.6);
`resample_rollup` + `gapfill` are that contract for tabular event
streams (the webtext axis: clickstreams, crawl logs), and `sessionize`
is the batch twin of streaming/ingest.py's session windows.

Scale notes (100 TB):

* ``resample_rollup`` — partial aggregation map-side, ONE shuffle on
  (key, bucket).  No window, no explode, no Python.
* spine — per-key ``explode(sequence(b0, b1))``: spine rows are bounded
  by time_range/bucket_seconds per key (e.g. 720 for a month of hourly
  buckets), NOT by event count; a billion-event key still yields a
  <=spine-sized partition downstream.  The explode is a JVM generator.
* LOCF / linear interp — window functions partitioned by key over the
  spine, so per-key window state is spine-bounded.  All expressions are
  codegen'd; zero Python anywhere in this module.
* ``sessionize`` — lag + running ``sum`` over (key, ts): the canonical
  two-window shape, one shuffle on key; the final per-session groupBy
  reuses the same hash partitioning (Catalyst elides the second
  exchange of a (key, session_id) groupBy after a key-partitioned
  window only when keys subsume — here it keeps one extra exchange on
  the much smaller session grain, which is the cheap side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from pyspark.sql.types import TimestampNTZType


def _epoch_seconds(df: DataFrame, ts: str) -> Column:
    """Microsecond-exact epoch seconds as double, TIMEZONE-FREE for both
    timestamp flavors (code-review r5: a bare NTZ→LTZ cast re-interprets
    naive values in the SESSION timezone — correct only under the
    harness's pinned UTC, and wrong across DST on a real cluster).

    * TIMESTAMP_NTZ — pure calendar-field decomposition
      (``unix_date``/``hour``/``minute``/``date_part('SECOND')`` are all
      tz-free on NTZ), matching DuckDB's ``epoch()`` naive-as-UTC
      semantics exactly.  NOT ``timestampdiff``: Spark coerces its NTZ
      operands to LTZ via the session timezone (verified — a DST-gap
      wall time shifts one hour under America/New_York).
    * TIMESTAMP (ltz) — `unix_micros`, already an absolute instant.
    """
    if isinstance(df.schema[ts].dataType, TimestampNTZType):
        micros = F.expr(
            f"cast(unix_date(cast({ts} as date)) as bigint) * 86400000000"
            f" + cast(hour({ts}) as bigint) * 3600000000"
            f" + cast(minute({ts}) as bigint) * 60000000"
            f" + cast(date_part('SECOND', {ts}) * 1000000 as bigint)"
        )
    else:
        micros = F.unix_micros(F.col(ts))
    return micros.cast("double") / F.lit(1e6)


def resample_rollup(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Irregular stream → regular (key, bucket) grid with per-bucket
    aggregates.  ``bucket = floor(epoch_seconds / bucket_seconds)`` —
    for positive epochs ``floor(truncate(x)/n) == floor(x/n)``, so
    integer `unix_timestamp` is bucket-exact."""
    b = (
        F.floor(_epoch_seconds(events, ts) / F.lit(bucket_seconds))
        .cast("long")
        .alias("bucket")
    )
    return events.groupBy(F.col(key), b).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.avg(value).alias("v_avg"),
        F.sum(value).alias("v_sum"),
        F.min(value).alias("v_min"),
        F.max(value).alias("v_max"),
    )


def dense_spine(rollup: DataFrame, key: str = "user_id", bucket: str = "bucket") -> DataFrame:
    """Per-key dense bucket spine [min(bucket) .. max(bucket)] — the
    regular grid gap-fill targets.  Row count is sum over keys of the
    key's bucket span, independent of event cardinality."""
    ext = rollup.groupBy(key).agg(
        F.min(bucket).alias("_b0"), F.max(bucket).alias("_b1")
    )
    return ext.select(key, F.explode(F.sequence("_b0", "_b1")).alias(bucket))


def gapfill(
    rollup: DataFrame,
    key: str = "user_id",
    bucket: str = "bucket",
    value: str = "v_avg",
    method: str = "locf",
) -> DataFrame:
    """Fill the dense spine's empty buckets from the rollup.

    ``locf``   — last observation carried forward (leading gap → null).
    ``linear`` — straight-line interpolation between the bracketing
    observations; leading/trailing gaps (no bracket) stay null.  The
    interpolation arithmetic is ``pv + (nv - pv) * ((b - pb) / (nb -
    pb))`` in doubles — mirrored verbatim by the SQL oracle so results
    are bit-identical.
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"unknown gapfill method {method!r}")
    spine = dense_spine(rollup, key, bucket)
    j = spine.join(rollup.select(key, bucket, value), [key, bucket], "left")
    w = W.partitionBy(key).orderBy(bucket)
    back = w.rowsBetween(W.unboundedPreceding, 0)
    v = F.col(value)
    prev_v = F.last(v, ignorenulls=True).over(back)
    if method == "locf":
        return j.withColumn("v_fill", prev_v)
    fwd = w.rowsBetween(0, W.unboundedFollowing)
    prev_b = F.last(F.when(v.isNotNull(), F.col(bucket)), ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_b = F.first(F.when(v.isNotNull(), F.col(bucket)), ignorenulls=True).over(fwd)
    interp = prev_v + (next_v - prev_v) * (
        (F.col(bucket) - prev_b) / (next_b - prev_b)
    )
    v_fill = F.when(v.isNotNull(), v).otherwise(
        F.when(prev_b.isNotNull() & next_b.isNotNull(), interp)
    )
    return j.withColumn("v_fill", v_fill)


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    gap_seconds: float = 1800.0,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event (per key, time order) exceeds ``gap_seconds``.
    Gap arithmetic runs on microsecond-exact epoch doubles via
    ``_epoch_seconds`` so it is timezone-, DST- and truncation-free for
    both timestamp flavors and mirrors DuckDB's ``epoch()``."""
    t = _epoch_seconds(events, ts)
    w = W.partitionBy(key).orderBy(F.col(ts).asc(), F.col(order_tiebreak).asc())
    prev_t = F.lag(t).over(w)
    is_new = F.when(
        prev_t.isNull() | ((t - prev_t) > F.lit(float(gap_seconds))), 1
    ).otherwise(0)
    with_sess = events.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    eps = _epoch_seconds(events, ts)
    return with_sess.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor(F.min(eps)).cast("long").alias("t_start"),
        F.floor(F.max(eps)).cast("long").alias("t_end"),
        F.sum(value).alias("v_sum"),
    )
