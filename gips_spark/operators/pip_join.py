"""M2 — point-in-polygon join: pages × spatial extents (SURVEY.md J2).

Reference parity: GIPS intersects a site polygon with the tile grid /
clips mosaics to it (`gips/data/core.py :: Repository.vector2tiles`,
`gips/tiles.py :: Tiles.project`).  Here: which pages fall inside which
spatial-extent polygon.

Two physically different plans, identical output (tested equal):

* ``pip_join`` — broadcast the (small) extent table, bbox-prefilter with
  a broadcast nested-loop range join, refine with the vectorized
  ray-casting kernel.  Best when extents are few.
* ``pip_join_cells`` — the 10^12-row plan: derive a per-extent candidate
  *cell* cover from the cell directory (cell bbox ∩ extent bbox — a
  cell-level join, ~10^6 rows, not a row-level one), broadcast the
  (extent, cell) cover, equi-join pages on h3_7 (partition-pruned by
  the cell-prefix layout), then ray-cast refine.  The refine kernel is
  the only Python; candidate pruning is all JVM equi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from gips_spark.functions.geom import rings_to_prepared


def _prepared_map(extents: DataFrame) -> dict:
    rows = extents.select("extent_id", "rings").collect()
    return {r["extent_id"]: rings_to_prepared(r["rings"]) for r in rows}


def make_pip_udf(spark, extents: DataFrame):
    """Build a pandas UDF `pip(extent_id, lon, lat) -> bool` with the
    prepared polygons shipped once per executor via Spark broadcast."""
    bc = spark.sparkContext.broadcast(_prepared_map(extents))

    @pandas_udf(T.BooleanType())
    def pip(extent_id: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        prep = bc.value
        out = np.zeros(len(extent_id), dtype=bool)
        lo = lon.to_numpy(dtype=np.float64)
        la = lat.to_numpy(dtype=np.float64)
        for eid, idx in extent_id.groupby(extent_id).groups.items():
            poly = prep.get(eid)
            if poly is None:
                continue
            ii = np.asarray(idx)
            out[ii] = poly.contains_chunked(lo[ii], la[ii])
        return pd.Series(out)

    return pip


def pip_join(spark, enriched: DataFrame, extents: DataFrame) -> DataFrame:
    """Broadcast-bbox plan → (url, extent_id) pairs."""
    pts = enriched.where(F.col("geocode_src") != "none").select("url", "lat", "lon")
    ext = extents.select("extent_id", "minx", "miny", "maxx", "maxy")
    cond = (
        (pts.lon >= ext.minx)
        & (pts.lon <= ext.maxx)
        & (pts.lat >= ext.miny)
        & (pts.lat <= ext.maxy)
    )
    cand = pts.join(F.broadcast(ext), cond, "inner")
    pip = make_pip_udf(spark, extents)
    return cand.where(pip(F.col("extent_id"), F.col("lon"), F.col("lat"))).select(
        "url", "extent_id"
    )


def extent_cell_cover(directory: DataFrame, extents: DataFrame) -> DataFrame:
    """Data-driven cover: observed cells whose bbox intersects extent bbox.

    Never misses a point (every point lies inside its cell's observed
    bbox by construction), regardless of hex-grid edge geometry.
    """
    d = directory.select("h3_7", "min_lat", "max_lat", "min_lon", "max_lon")
    e = extents.select("extent_id", "minx", "miny", "maxx", "maxy")
    cond = (
        (d.min_lon <= e.maxx)
        & (d.max_lon >= e.minx)
        & (d.min_lat <= e.maxy)
        & (d.max_lat >= e.miny)
    )
    return d.join(F.broadcast(e), cond, "inner").select("extent_id", "h3_7")


def pip_join_cells(
    spark, enriched: DataFrame, extents: DataFrame, directory: DataFrame
) -> DataFrame:
    """Cell-cover plan → (url, extent_id) pairs (scale path)."""
    cover = extent_cell_cover(directory, extents)
    pts = enriched.where(F.col("geocode_src") != "none").select(
        "url", "lat", "lon", "h3_7"
    )
    cand = pts.join(F.broadcast(cover), "h3_7", "inner")
    pip = make_pip_udf(spark, extents)
    return cand.where(pip(F.col("extent_id"), F.col("lon"), F.col("lat"))).select(
        "url", "extent_id"
    )


def coverage_fractions(
    spark, enriched: DataFrame, extents: DataFrame, directory: DataFrame
) -> DataFrame:
    """J1 analog — per (extent, cell): urls inside / urls in cell (the
    reference's (%-of-site, %-of-tile) coverage pair, url-weighted).

    Works on the latest crawl per url (J6 dedup) so re-crawled urls
    count once — pairs joined back on raw rows would double-count.
    Output: extent_id, h3_7, urls_in, pcov (share of the extent's urls
    in this cell), ptile (share of the cell's urls inside the extent) —
    feeds the F6 coverage-threshold filter.
    """
    from gips_spark.operators.tile_assign import latest_per_url

    ded = latest_per_url(enriched)
    pts = ded.where(F.col("geocode_src") != "none").select("url", "h3_7")
    pairs = pip_join_cells(spark, ded, extents, directory)
    inside = pairs.join(pts, "url").groupBy("extent_id", "h3_7").agg(
        F.count(F.lit(1)).alias("urls_in")
    )
    per_ext = inside.groupBy("extent_id").agg(F.sum("urls_in").alias("ext_urls"))
    cell_totals = pts.groupBy("h3_7").agg(F.count(F.lit(1)).alias("cell_urls"))
    out = (
        inside.join(per_ext, "extent_id")
        .join(cell_totals, "h3_7")
        .select(
            "extent_id",
            "h3_7",
            "urls_in",
            (F.col("urls_in") / F.col("ext_urls")).alias("pcov"),
            (F.col("urls_in") / F.col("cell_urls")).alias("ptile"),
        )
    )
    return out
