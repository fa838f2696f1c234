"""Catalog IO (Iceberg-or-parquet), project-dir + stats-CSV sinks, X1 parse."""

import glob

import pyspark.sql.functions as F

from gips_spark.operators import relational, zonal
from gips_spark.sources import catalog


def test_write_read_roundtrip(spark, scenes, tmp_path):
    path = str(tmp_path / "tbl")
    engine = catalog.write_table(
        spark, scenes, path, partition_cols=("sensor",), mode="overwrite"
    )
    assert engine == "parquet"  # no Iceberg jars in-sandbox (documented)
    back = catalog.read_table(spark, path)
    assert back.count() == scenes.count()
    assert set(back.columns) == set(scenes.columns)


def test_project_dir_sink(spark, scenes, tmp_path):
    out = str(tmp_path / "proj")
    catalog.write_project_dir(scenes.limit(200), out)
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert len(glob.glob(f"{out}/date=*")) > 1  # per-date partitions (S7)


def test_stats_csv_sink_byte_stable(spark, raster_chunks, extents, tmp_path):
    stats = zonal.zonal_stats(spark, raster_chunks, extents)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    catalog.write_stats_csv(stats, a)
    catalog.write_stats_csv(stats.repartition(7), b)
    fa = sorted(glob.glob(f"{a}/part-*.csv"))[0]
    fb = sorted(glob.glob(f"{b}/part-*.csv"))[0]
    assert open(fa, "rb").read() == open(fb, "rb").read()
    assert open(fa).readline().startswith("extent_id")


def test_parse_scene_id(spark, scenes):
    parsed = relational.parse_scene_id(scenes)
    bad = parsed.where(
        (F.col("p_sensor") != F.col("sensor"))
        | (F.col("p_tile_id") != F.col("tile_id"))
        | (F.col("p_date") != F.col("acq_date"))
    ).count()
    assert bad == 0
