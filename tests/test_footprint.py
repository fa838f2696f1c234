"""Area-weighted footprint coverage (J1) vs dense-grid numpy oracle."""

import numpy as np
import pyspark.sql.functions as F

from gips_spark.functions import h3lite
from gips_spark.operators import footprint


def _dense_area_oracle(quad: np.ndarray, cells: np.ndarray, res: int = 7):
    """Monte-Carlo-style dense grid: per-cell sinusoidal area of the
    footprint interior (independent of the clip kernel)."""
    step = 0.002
    lon_s = np.arange(quad[:, 0].min(), quad[:, 0].max() + step, step)
    lat_s = np.arange(quad[:, 1].min(), quad[:, 1].max() + step, step)
    gg = np.meshgrid(lat_s, lon_s)
    la, lo = gg[0].ravel(), gg[1].ravel()
    inside = np.ones(la.shape, dtype=bool)
    q = quad
    if (
        np.dot(q[:, 0], np.roll(q[:, 1], -1)) - np.dot(q[:, 1], np.roll(q[:, 0], -1))
    ) < 0:
        q = q[::-1]
    for e in range(len(q)):
        a, b = q[e], q[(e + 1) % len(q)]
        inside &= (b[0] - a[0]) * (la - a[1]) - (b[1] - a[1]) * (lo - a[0]) >= 0
    la, lo = la[inside], lo[inside]
    ids = h3lite.latlng_to_cell(la, lo, res)
    # per-sample sinusoidal area weight (m²)
    r = 6371008.8
    w = (np.radians(step) * r) ** 2 * np.cos(np.radians(la))
    out = {}
    for c in cells:
        out[int(c)] = float(w[ids == c].sum())
    return out


def test_footprint_cover_vs_dense_oracle(spark, scenes):
    one = scenes.limit(1).collect()[0]
    sub = scenes.where(F.col("footprint_wkt") == one["footprint_wkt"])
    got = footprint.footprint_cover(spark, sub).toPandas()
    got = got[got["scene_id"] == one["scene_id"]].reset_index(drop=True)

    quad = footprint.parse_wkt_polygon(one["footprint_wkt"])
    from gips_spark.functions.geom import ring_area_m2

    a_fp = ring_area_m2(quad[:, 0], quad[:, 1])

    # invariants: the hex grid tessellates → pieces sum to the footprint
    assert abs(got["a_m2"].sum() / a_fp - 1.0) < 0.005
    assert abs(got["pcov"].sum() - 1.0) < 0.005
    assert ((got["ptile"] > 0) & (got["ptile"] <= 1.0 + 1e-9)).all()
    # interior cells exist and have ptile == 1
    assert (got["ptile"] > 0.999999).sum() > 10

    # per-cell areas vs the dense-grid oracle.  A straight footprint
    # edge crossing a hex leaves a one-sample-row uncertainty band of
    # ~edge_len × step_m on the grid estimate — tolerance accounts for
    # it (≈2.4 km hex crossing × 0.002° ≈ 160 m rows → ~0.4 km² band).
    oracle = _dense_area_oracle(quad, got["h3_7"].to_numpy())
    band = 2400.0 * 0.002 * 111_320 * 0.7  # m²; conservative half-weight
    big = got[got["a_m2"] > 2e5]
    assert len(big) > 50
    for _, r in big.iterrows():
        w = oracle[int(r["h3_7"])]
        assert abs(r["a_m2"] - w) <= max(0.03 * max(r["a_m2"], w), 0.6 * band), (
            r["h3_7"], r["a_m2"], w
        )

    # ultra-dense check of the single largest BOUNDARY cell: the clip
    # kernel's area within 0.5% of a 0.0002° in-hex integration
    from gips_spark.functions import geom as geomf

    bnd = got[(got["ptile"] > 0.05) & (got["ptile"] < 0.95)]
    r = bnd.sort_values("a_m2").iloc[-1]
    blat, blng = h3lite.cell_boundary(np.array([int(r["h3_7"])]))
    hexagon = np.stack([blng[0], blat[0]], axis=1)
    q = quad
    if (
        np.dot(q[:, 0], np.roll(q[:, 1], -1)) - np.dot(q[:, 1], np.roll(q[:, 0], -1))
    ) < 0:
        q = q[::-1]
    step = 0.0002
    lo = np.arange(blng[0].min(), blng[0].max() + step, step)
    la = np.arange(blat[0].min(), blat[0].max() + step, step)
    gg = np.meshgrid(la, lo)
    pla, plo = gg[0].ravel(), gg[1].ravel()
    ins = np.ones(pla.shape, bool)
    hh = hexagon[::-1] if (
        np.dot(hexagon[:, 0], np.roll(hexagon[:, 1], -1))
        - np.dot(hexagon[:, 1], np.roll(hexagon[:, 0], -1))
    ) < 0 else hexagon
    for poly in (hh, q):
        for e in range(len(poly)):
            a, b = poly[e], poly[(e + 1) % len(poly)]
            ins &= (b[0] - a[0]) * (pla - a[1]) - (b[1] - a[1]) * (plo - a[0]) >= 0
    rr = 6371008.8
    w = (np.radians(step) * rr) ** 2 * np.cos(np.radians(pla))
    a_dense = float(w[ins].sum())
    assert abs(r["a_m2"] / a_dense - 1.0) < 0.005


def test_footprint_cover_all_scenes_shapes(spark, scenes):
    """Whole-table run: every scene covered, fractions well-formed,
    per-date scenes of one (sensor, tile) share identical cover rows."""
    cov = footprint.footprint_cover(spark, scenes).cache()
    n_scenes = scenes.count()
    assert cov.select("scene_id").distinct().count() == n_scenes
    sums = cov.groupBy("scene_id").agg(F.sum("pcov").alias("s"))
    bad = sums.where((F.col("s") < 0.995) | (F.col("s") > 1.005)).count()
    assert bad == 0
    two = (
        scenes.groupBy("footprint_wkt")
        .agg(F.collect_list("scene_id").alias("ids"))
        .where(F.size("ids") >= 2)
        .first()
    )
    if two:
        a, b = two["ids"][0], two["ids"][1]
        ca = cov.where(F.col("scene_id") == a).select("h3_7", "a_m2")
        cb = cov.where(F.col("scene_id") == b).select("h3_7", "a_m2")
        assert ca.exceptAll(cb).count() == 0 and cb.exceptAll(ca).count() == 0


def test_scenes_with_cells_populates_column(spark, scenes):
    from pyspark.sql import functions as F2

    sub = scenes.limit(30)
    got = footprint.scenes_with_cells(spark, sub)
    assert "h3_cells" in got.columns
    assert got.where(F2.size("h3_cells") > 10).count() == 30
    # sorted + distinct
    one = got.select("h3_cells").first()["h3_cells"]
    assert one == sorted(one) and len(one) == len(set(one))
