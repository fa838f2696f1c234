"""gips_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the tile-oriented capabilities of the reference (gipit/gips —
a satellite-imagery inventory/processing framework organised as tiles×dates,
see SURVEY.md) over web-scale text data, per BASELINE.json:

* every record (web pages geocoded from url/text, plus GIPS-style scene
  footprints) is assigned to H3 res-7 and S2 level-13 cells via vectorized
  Arrow UDFs (``gips_spark.functions``),
* point-in-polygon joins against spatial-extent polygons use a
  prepared-geometry ray-casting kernel (``operators.pip_join``),
* kNN queries run by cell-ring expansion with broadcast candidate pruning
  and an exact verification pass (``operators.knn``),
* raster↔vector zonal aggregation reproduces GIPS per-tile product outputs
  (indices, masks, stats — ``operators.zonal``),
* data is range-partitioned by cell prefix with explicit salting for skewed
  mega-cells (``plans.salt``), and
* every stage checkpoints per-partition lineage (cell range, row count,
  checksum) for idempotent resume (``plans.lineage``).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the public H3 and S2 indexing specs, and standard
computational-geometry formulas.
"""

__version__ = "0.1.0"

from gips_spark.session import get_spark  # noqa: F401
