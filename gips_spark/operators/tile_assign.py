"""M1 — the flagship pipeline: pages → pages_enriched → tile_assignments.

Reference parity: this is the engine's `vector2tiles` + inventory build
(`gips/data/core.py :: Repository.vector2tiles` + `gips/inventory ::
DataInventory.__init__`, SURVEY.md §2.3 J1, §3 E1): every record gets a
tile (H3 res-7 + S2 level-13 cell) the way every GIPS asset gets a grid
tile.

Plan shape (scale notes):
  read pages (column pruning matters — `html` is only selected here)
  → ONE fused Arrow UDF (extract+geocode+h3+s2; one Python hop)
  → broadcast-join the salt plan (tiny) → salt column
  → repartitionByRange(cell_prefix, salt)  ← the single explicit
    shuffle, whose layout downstream stages reuse (SURVEY.md §3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from gips_spark.functions import udfs
from gips_spark.plans import salt as saltplan

#: id truncated below digit 4 → res-4 granularity range-partition key
PREFIX_SHIFT = 33


def enrich_pages(
    pages: DataFrame,
    salt_target_rows: int = saltplan.DEFAULT_TARGET_ROWS,
    do_repartition: bool = True,
    persist: bool = True,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → pages_enriched.

    The fused Arrow UDF output is persisted (MEMORY_AND_DISK) before the
    salt histogram and the range-partition sampling pass — otherwise the
    Python stage runs 3× (histogram, range sampler, final).  On a real
    cluster the lineage protocol replaces the persist with a bucketed
    parquet checkpoint between stages (plans/lineage.py), same effect.
    """
    glat, glon, gsrc = udfs.geocode_exprs(F.col("url"), F.col("text"))
    e = (
        pages.withColumn("stripped", udfs.strip_html_expr(F.col("html")))
        .withColumn("lat", glat)
        .withColumn("lon", glon)
        .withColumn("geocode_src", gsrc)
        .withColumn(
            "e", udfs.extract_and_cells(F.col("stripped"), F.col("lat"), F.col("lon"))
        )
        .select("url", "warc_ts", "lang", "lat", "lon", "geocode_src", "e.*")
    )
    e = e.withColumn(
        "cell_prefix",
        F.when(
            F.col("h3_7").isNotNull(), F.shiftright(F.col("h3_7"), PREFIX_SHIFT)
        ).otherwise(F.lit(-1)).cast("int"),
    )
    if persist:
        from pyspark import StorageLevel

        e = e.persist(StorageLevel.MEMORY_AND_DISK)
    e = saltplan.with_salt(e, "h3_7", "url", target_rows=salt_target_rows)
    if do_repartition:
        e = e.repartitionByRange("cell_prefix", "salt")
    return e


def tile_assignments(enriched: DataFrame) -> DataFrame:
    """Golden output table: (url, h3_7, s2_13) for geocodable rows."""
    return enriched.where(F.col("geocode_src") != "none").select(
        "url", "h3_7", "s2_13"
    )


def latest_per_url(enriched: DataFrame) -> DataFrame:
    """J6/W1 — as-of dedup: keep the latest crawl per url (the reference's
    sensor-preference 'one best observation per (tile, date)' pattern)."""
    w = W.partitionBy("url").orderBy(
        F.col("warc_ts").desc(), F.col("geocode_src").asc()
    )
    return (
        enriched.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
