"""Cell directory — per-cell statistics used for exact candidate pruning.

One aggregation over the enriched pages produces, per observed res-7
cell: row count, centroid, lat/lon bbox, and max great-circle radius
from the bbox center.  This is the engine's broadcastable pruning index:

* kNN (operators/knn.py): candidate cells = cells whose *minimum
  possible* distance to the query (haversine to bbox, minus radius
  bound) is below the current search radius.  Exactness never depends
  on hex-grid neighbor geometry.
* PIP (operators/pip_join.py): candidate cells per extent = cells whose
  bbox intersects the extent bbox — a data-driven cover, no polygon/
  cell-boundary math, never misses a point.

Scale posture: distinct res-7 cells are bounded by data geography (≪
rows; low millions worldwide at 10^12 rows).  The directory itself is
computed distributed; only per-extent/per-query *slices* are collected
or broadcast.  For even larger directories the same table rolls up to
res-4 prefixes first (coarse→fine pruning) — see knn.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_cell_directory(enriched: DataFrame, cell_col: str = "h3_7") -> DataFrame:
    pts = enriched.where(F.col(cell_col).isNotNull() & (F.col("geocode_src") != "none"))
    return pts.groupBy(cell_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.avg("lat").alias("c_lat"),
        F.avg("lon").alias("c_lon"),
        F.min("lat").alias("min_lat"),
        F.max("lat").alias("max_lat"),
        F.min("lon").alias("min_lon"),
        F.max("lon").alias("max_lon"),
    )
