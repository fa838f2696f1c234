"""X6 — atmospheric correction: dark-object subtraction (DOS1).

Reference parity: the reference's full radiative-transfer path
(`gips/atmosphere.py :: SixS` [SPEC]) drives the 6S model with
per-acquisition aerosol/water-vapour inputs — external coefficient
tables that don't exist in this sandbox (SURVEY §7.3 originally listed
X6 as a non-goal for that reason).  DOS1 (Chavez 1988, "An improved
dark-object subtraction technique for atmospheric scattering correction
of multispectral data") is the standard IMAGE-BASED correction the same
reference module falls back to conceptually: the darkest pixel of each
(scene, band) is assumed to be a zero-reflectance object, so its
observed value estimates the additive path-radiance (haze) term;
subtract it everywhere and clamp at zero.  A gain/offset hook
(`apply_gain_offset`) covers the reference's linear radiance transform
(`gippy.GeoRaster.SetGain/SetOffset` analog).

Execution shape (100-TB-safe, zero Python):
1. per-chunk dark value — `array_min(filter(pixels, ≠ nodata))`, a
   codegen'd JVM expression on the array column;
2. per-(scene, band) haze — one `groupBy().min()` over the tiny
   per-chunk rollup (partial aggregation map-side);
3. correction — the haze table is broadcast back and every pixel gets
   `greatest(p - haze, 0)` inside one `transform(...)` lambda, again
   pure JVM codegen.  No shuffle of pixel data at any point: the only
   exchange carries one row per (scene, band, chunk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_dark_values(chunks: DataFrame) -> DataFrame:
    """→ (scene_id, band, chunk_id, dark): per-chunk minimum over
    non-nodata pixels (null when the chunk is all-nodata)."""
    dark = F.array_min(
        F.filter("pixels", lambda p: p != F.col("nodata"))
    )
    return chunks.select("scene_id", "band", "chunk_id", dark.alias("dark"))


def scene_haze(chunks: DataFrame) -> DataFrame:
    """→ (scene_id, band, haze): the DOS1 dark-object estimate — the
    minimum non-nodata pixel value across the whole (scene, band)."""
    return (
        chunk_dark_values(chunks)
        .groupBy("scene_id", "band")
        .agg(F.min("dark").alias("haze"))
    )


def dos_correction(chunks: DataFrame) -> DataFrame:
    """DOS1-corrected raster chunks (same RASTER_SCHEMA shape).

    corrected[p] = nodata            if p == nodata
                   max(p - haze, 0)  otherwise

    The haze table has one row per (scene, band) — broadcast join; the
    subtraction runs inside a codegen'd `transform` lambda.  All-nodata
    scenes (haze null) pass through unchanged via coalesce(haze, 0).
    """
    haze = F.broadcast(scene_haze(chunks))
    joined = chunks.join(haze, ["scene_id", "band"], "left")
    hz = F.coalesce(F.col("haze"), F.lit(0.0)).cast("float")
    corrected = F.transform(
        "pixels",
        lambda p: F.when(p == F.col("nodata"), p).otherwise(
            F.greatest(p - hz, F.lit(0.0).cast("float"))
        ),
    )
    return joined.select(
        "scene_id",
        "band",
        "chunk_id",
        "x0",
        "y0",
        "w",
        "h",
        corrected.alias("pixels"),
        "nodata",
        "gt",
    )


def apply_gain_offset(chunks: DataFrame, gain: float, offset: float) -> DataFrame:
    """Linear radiance transform p → p·gain + offset (nodata preserved)
    — the `SetGain/SetOffset` analog, one JVM transform lambda."""
    out = F.transform(
        "pixels",
        lambda p: F.when(p == F.col("nodata"), p).otherwise(
            (p * F.lit(float(gain)) + F.lit(float(offset))).cast("float")
        ),
    )
    return chunks.withColumn("pixels", out)
