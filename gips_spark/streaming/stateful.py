"""Custom stateful streaming operator: per-url crawl-session state.

SURVEY.md §2.9 marks streaming optional; this adds the
`applyInPandasWithState` surface (custom stateful operators) the task
brief names: per url keep (n_crawls, first_ts, last_ts) in state and
emit an update row per batch in which the url appears.  The reference
analog is the inventory's per-asset update tracking (`--update` runs,
`gips/data/core.py :: Data.process` skip/update logic).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("n_crawls", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_crawls", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_url_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, first_ts, last_ts = state.get
    else:
        n, first_ts, last_ts = 0, None, None
    for pdf in pdfs:
        ts = pd.to_datetime(pdf["warc_ts"])
        n += len(pdf)
        mn, mx = ts.min(), ts.max()
        first_ts = mn if first_ts is None or mn < first_ts else first_ts
        last_ts = mx if last_ts is None or mx > last_ts else last_ts
    state.update((n, first_ts, last_ts))
    yield pd.DataFrame(
        {
            "url": [key[0]],
            "n_crawls": [n],
            "first_ts": [first_ts],
            "last_ts": [last_ts],
        }
    )


def crawl_session_counts(pages_stream: DataFrame) -> DataFrame:
    """Streaming (url → crawl-session stats) via applyInPandasWithState."""
    return (
        pages_stream.select("url", "warc_ts")
        .groupBy("url")
        .applyInPandasWithState(
            _update_url_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now_memory(spark, in_path: str, checkpoint: str, name: str = "crawl_state"):
    """Drain `in_path` through the stateful operator into a memory sink;
    returns the final snapshot DataFrame (latest update row per url)."""
    from gips_spark.streaming.ingest import read_pages_stream

    stream = read_pages_stream(spark, in_path)
    q = (
        crawl_session_counts(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # memory sink in update mode appends each update row; latest per url wins
    from pyspark.sql import Window as W
    import pyspark.sql.functions as F

    all_rows = spark.table(name)
    w = W.partitionBy("url").orderBy(F.col("n_crawls").desc())
    return (
        all_rows.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
