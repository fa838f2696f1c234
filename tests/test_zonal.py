"""Zonal/raster tests vs independent numpy + duckdb oracles."""

import duckdb
import numpy as np
import pyspark.sql.functions as F

from gips_spark.functions.geom import rings_to_prepared
from gips_spark.operators import zonal


def _band_arrays(pdf):
    return {
        (r["scene_id"], r["band"], r["chunk_id"]): np.asarray(r["pixels"], dtype=np.float64)
        for _, r in pdf.iterrows()
    }


def test_products_match_numpy_oracle(spark, raster_chunks):
    prod = zonal.compute_products(raster_chunks, ["ndvi", "msavi2"]).toPandas()
    src = raster_chunks.toPandas()
    arrs = _band_arrays(src)
    nodata = -9999.0
    for _, r in prod.head(50).iterrows():
        key = (r["scene_id"], "nir", r["chunk_id"])
        nir = arrs[key]
        red = arrs[(r["scene_id"], "red", r["chunk_id"])]
        valid = (nir != nodata) & (red != nodata)
        got = np.asarray(r["pixels"], dtype=np.float64)
        if r["band"] == "ndvi":
            want = (nir - red) / (nir + red)
        else:
            want = (2 * nir + 1 - np.sqrt((2 * nir + 1) ** 2 - 8 * (nir - red))) / 2
        assert np.allclose(got[valid], want[valid].astype(np.float32), atol=1e-6)
        assert np.all(got[~valid] == nodata)


def test_zonal_stats_match_numpy_oracle(spark, raster_chunks, extents):
    stats = zonal.zonal_stats(spark, raster_chunks, extents).toPandas()
    assert len(stats) > 0
    src = raster_chunks.toPandas()
    prep = {
        r["extent_id"]: rings_to_prepared(r["rings"])
        for r in extents.select("extent_id", "rings").collect()
    }
    for _, row in stats.head(12).iterrows():
        poly = prep[row["extent_id"]]
        vals = []
        sub = src[(src["scene_id"] == row["scene_id"]) & (src["band"] == row["band"])]
        for _, ch in sub.iterrows():
            gt = list(ch["gt"])
            w, h = int(ch["w"]), int(ch["h"])
            lons = gt[0] + (np.arange(w) + int(ch["x0"]) + 0.5) * gt[1]
            lats = gt[3] + (np.arange(h) + int(ch["y0"]) + 0.5) * gt[5]
            lon_g = np.repeat(lons[None, :], h, axis=0).ravel()
            lat_g = np.repeat(lats[:, None], w, axis=1).ravel()
            px = np.asarray(ch["pixels"], dtype=np.float64)
            inside = poly.contains_chunked(lon_g, lat_g)
            v = px[inside & (px != float(ch["nodata"]))]
            vals.append(v)
        v = np.concatenate(vals) if vals else np.array([])
        assert row["count"] == v.size
        assert np.isclose(row["mean"], v.mean(), rtol=1e-9)
        assert np.isclose(row["min"], v.min()) and np.isclose(row["max"], v.max())
        assert np.isclose(row["stddev"], v.std(ddof=1), rtol=1e-7)
        m2 = ((v - v.mean()) ** 2).mean()
        m3 = ((v - v.mean()) ** 3).mean()
        if m2 > 1e-12:
            assert np.isclose(row["skew"], m3 / m2**1.5, rtol=1e-6)


def test_zonal_rollup_subtotals(spark, raster_chunks, extents):
    base = zonal.zonal_stats(spark, raster_chunks, extents).toPandas()
    rolled = zonal.zonal_stats(spark, raster_chunks, extents, rollup=True).toPandas()
    # detail rows identical
    detail = rolled[rolled["band"].notna() & rolled["scene_id"].notna()]
    assert len(detail) == len(base)
    # per-extent subtotal equals recombination of that extent's details
    top = rolled[rolled["scene_id"].isna() & rolled["extent_id"].notna()]
    for _, r in top.iterrows():
        sub = base[base["extent_id"] == r["extent_id"]]
        assert r["count"] == sub["count"].sum()
        assert np.isclose(
            r["mean"],
            (sub["mean"] * sub["count"]).sum() / sub["count"].sum(),
            rtol=1e-9,
        )


def test_scene_band_means_vs_duckdb(spark, raster_chunks):
    got = zonal.scene_band_means(raster_chunks).toPandas()
    src = raster_chunks.select("scene_id", "band", "pixels", "nodata").toPandas()
    want = duckdb.sql(
        """
        select scene_id, band, avg(px) band_mean, count(*) valid_px
        from (select scene_id, band, nodata, unnest(pixels) px from src)
        where px <> nodata group by 1, 2
        """
    ).df()
    m = got.merge(want, on=["scene_id", "band"], suffixes=("", "_w"))
    assert len(m) == len(got) == len(want)
    assert np.allclose(m["band_mean"], m["band_mean_w"], rtol=1e-9)
    assert (m["valid_px"] == m["valid_px_w"]).all()


def test_temporal_composite_vs_duckdb(spark, scenes, raster_chunks):
    prod = zonal.compute_products(raster_chunks, ["ndvi"]).cache()
    got = zonal.temporal_composite(scenes, prod, "ndvi", days=32).toPandas()
    means = zonal.scene_band_means(prod).toPandas()
    sc = scenes.select("scene_id", "tile_id", "acq_date").toPandas()
    want = duckdb.sql(
        """
        select tile_id,
               date '2025-01-01' + to_days((cast(floor(datediff('day', date '2025-01-01', acq_date)/32) as int))*32) window_start,
               max(band_mean) max_val
        from means join sc using (scene_id)
        where band = 'ndvi' group by 1, 2
        """
    ).df()
    got_s = got.sort_values(["tile_id", "window_start"]).reset_index(drop=True)
    want_s = want.sort_values(["tile_id", "window_start"]).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    assert np.allclose(got_s["max_val"], want_s["max_val"], rtol=1e-12)


def test_mask_application(spark, raster_chunks):
    prod = zonal.compute_products(raster_chunks, ["ndvi"]).cache()
    mask = zonal.cloud_mask(raster_chunks, threshold=0.2).cache()
    masked = zonal.apply_mask(prod, mask)
    # masked rows keep schema and nodata increases or stays equal
    def nodata_count(df):
        return (
            df.select(
                F.aggregate(
                    "pixels",
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + F.when(x == F.col("nodata"), 1).otherwise(0),
                ).alias("nd")
            )
            .agg(F.sum("nd"))
            .first()[0]
        )

    assert nodata_count(masked) >= nodata_count(prod)


def test_mosaic_deterministic_first_wins(spark, raster_chunks):
    prod = zonal.compute_products(raster_chunks, ["ndvi"]).cache()
    m1 = zonal.mosaic_first_nonnodata(prod, "ndvi").toPandas()
    m2 = zonal.mosaic_first_nonnodata(prod.repartition(13), "ndvi").toPandas()
    m1 = m1.sort_values("scene_id").reset_index(drop=True)
    m2 = m2.sort_values("scene_id").reset_index(drop=True)
    assert (m1["scene_id"] == m2["scene_id"]).all()
    for a, b in zip(m1["pixels"], m2["pixels"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
