"""Temporal rollup / gap-fill / sessionize / grouped-stats oracles.

Edge cases the driver queries (gapfill_locf, interp_linear,
sessionize_2h, stats_agg at sf0.01) cannot stress: leading/trailing
gaps, single-observation keys, the exact ==gap boundary, and the
population-moment definitions of skewness/kurtosis vs numpy.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from gips_spark.operators import temporal
from gips_spark.operators.relational import grouped_stats

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    """rows: (user_id, seconds_after_T0, value)."""
    data = [
        (i, u, T0 + dt.timedelta(seconds=s), float(v))
        for i, (u, s, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, value double"
    )


@pytest.fixture(scope="module")
def stream(spark):
    # user 1: hourly buckets 0, 1, 5 (interior gap 2-4)
    # user 2: a single observation (degenerate spine)
    # user 7: two obs in ONE bucket (avg path) + trailing bucket
    return _ev(
        spark,
        [
            (1, 0, 10.0),
            (1, 3600, 20.0),
            (1, 5 * 3600 + 1800, 50.0),
            (2, 7200, 7.0),
            (7, 100, 4.0),
            (7, 200, 8.0),
            (7, 2 * 3600, 6.0),
        ],
    ).cache()


def test_resample_rollup(spark, stream):
    r = {
        (x["user_id"], x["bucket"]): x
        for x in temporal.resample_rollup(stream).collect()
    }
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    assert set(r) == {
        (1, base), (1, base + 1), (1, base + 5),
        (2, base + 2), (7, base), (7, base + 2),
    }
    two = r[(7, base)]
    assert two["n_obs"] == 2 and two["v_avg"] == 6.0
    assert two["v_min"] == 4.0 and two["v_max"] == 8.0 and two["v_sum"] == 12.0


def test_gapfill_locf(spark, stream):
    out = temporal.gapfill(temporal.resample_rollup(stream), method="locf")
    rows = {
        (x["user_id"], x["bucket"]): x["v_fill"]
        for x in out.collect()
    }
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    # user 1: gap buckets 2-4 carry bucket-1's value forward
    for b in (2, 3, 4):
        assert rows[(1, base + b)] == 20.0
    assert rows[(1, base + 5)] == 50.0
    # single-observation spine: one row, its own value
    assert rows[(2, base + 2)] == 7.0
    # user 7 gap bucket 1 carries the two-obs average
    assert rows[(7, base + 1)] == 6.0
    assert len(rows) == 6 + 3 + 1  # dense spines: u1=6, u7=3, u2=1


def test_gapfill_linear(spark, stream):
    out = temporal.gapfill(temporal.resample_rollup(stream), method="linear")
    rows = {
        (x["user_id"], x["bucket"]): x["v_fill"] for x in out.collect()
    }
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    # user 1 buckets 2-4 interpolate 20 → 50 over 4 steps
    assert rows[(1, base + 2)] == pytest.approx(27.5, abs=0)
    assert rows[(1, base + 3)] == pytest.approx(35.0, abs=0)
    assert rows[(1, base + 4)] == pytest.approx(42.5, abs=0)
    # observed buckets keep their own value
    assert rows[(1, base)] == 10.0 and rows[(1, base + 5)] == 50.0


def test_gapfill_linear_edge_gaps_stay_null(spark):
    # leading gap (no left bracket) after clipping spine to min..max
    # can't occur by construction — the spine starts at an observation —
    # so emulate an interior-only check plus the single-point key
    one = _ev(spark, [(9, 0, 3.0)])
    out = temporal.gapfill(temporal.resample_rollup(one), method="linear")
    got = out.collect()
    assert len(got) == 1 and got[0]["v_fill"] == 3.0


def test_gapfill_bad_method(spark, stream):
    with pytest.raises(ValueError, match="unknown gapfill method"):
        temporal.gapfill(temporal.resample_rollup(stream), method="spline")


def test_sessionize_boundary(spark):
    # gaps: exactly 1800s (same session), 1801s (new session)
    ev = _ev(
        spark,
        [
            (3, 0, 1.0),
            (3, 1800, 2.0),        # == gap → same session
            (3, 1800 + 1801, 4.0), # > gap → new session
            (4, 50, 9.0),
        ],
    )
    out = temporal.sessionize(ev, gap_seconds=1800.0)
    rows = {
        (x["user_id"], x["session_id"]): x for x in out.collect()
    }
    assert set(rows) == {(3, 1), (3, 2), (4, 1)}
    s1 = rows[(3, 1)]
    assert s1["n_events"] == 2 and s1["v_sum"] == 3.0
    assert s1["t_end"] - s1["t_start"] == 1800
    assert rows[(3, 2)]["n_events"] == 1


def test_grouped_stats_matches_numpy(spark):
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 30, 400)
    y = 2.5 * x + rng.normal(0, 4, 400)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(x, y)], "g string, x double, y double"
    )
    got = grouped_stats(df, "g", "x", "y").collect()[0]
    mu = y.mean()
    m2, m3, m4 = [((y - mu) ** k).mean() for k in (2, 3, 4)]
    assert got["n"] == 400
    assert got["corr_xy"] == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-9)
    assert got["covar_s"] == pytest.approx(np.cov(x, y, ddof=1)[0, 1], abs=1e-9)
    assert got["covar_p"] == pytest.approx(np.cov(x, y, ddof=0)[0, 1], abs=1e-9)
    assert got["std_y"] == pytest.approx(y.std(ddof=1), abs=1e-9)
    slope = np.cov(x, y, ddof=0)[0, 1] / x.var()
    assert got["slope"] == pytest.approx(slope, abs=1e-9)
    assert got["icept"] == pytest.approx(mu - slope * x.mean(), abs=1e-9)
    assert got["r2"] == pytest.approx(np.corrcoef(x, y)[0, 1] ** 2, abs=1e-9)
    # Spark = POPULATION g1 / excess kurtosis (the oracle SQL mirrors this)
    assert got["skew_y"] == pytest.approx(m3 / m2**1.5, abs=1e-9)
    assert got["kurt_y"] == pytest.approx(m4 / m2**2 - 3.0, abs=1e-9)


def test_temporal_plans_python_free(spark, stream):
    """The whole family is JVM built-ins — no EvalPython stage ever."""
    for df in (
        temporal.gapfill(temporal.resample_rollup(stream), method="linear"),
        temporal.sessionize(stream),
    ):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_sessionize_agrees_with_builtin_session_window(spark):
    """Two INDEPENDENT session implementations must agree: the
    lag+running-sum sessionize vs Spark's built-in session_window
    grouping (incl. the ==gap boundary, which BOTH treat as same-
    session — probed and pinned here)."""
    rows = []
    # deterministic irregular stream: 6 users, gaps cycling through
    # values below/at/above the 1800s threshold
    gaps = [10, 450, 1800, 1801, 90, 7200, 1799, 3600, 25, 1800]
    for u in range(6):
        t = u * 37
        for i, g in enumerate(gaps):
            t += g + (u * 13 + i * 7) % 120 if g not in (1799, 1800, 1801) else g
            rows.append((u, t, float((u + i) % 9)))
    ev = _ev(spark, [(u, s, v) for u, s, v in rows])

    a = temporal.sessionize(ev, gap_seconds=1800.0)
    got_a = {
        (r["user_id"], r["t_start"], r["n_events"], round(r["v_sum"], 9))
        for r in a.collect()
    }
    b = (
        ev.groupBy(
            F.session_window("ts", "1800 seconds").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("t_start"),
            "n",
            F.round("v", 9).alias("v"),
        )
    )
    got_b = {
        (r["user_id"], r["t_start"], r["n"], r["v"]) for r in b.collect()
    }
    assert got_a == got_b and len(got_a) >= 18


def test_ntz_epoch_arithmetic_is_session_tz_independent(spark):
    """code-review r5: a bare NTZ→LTZ cast made bucket/gap arithmetic
    depend on spark.sql.session.timeZone.  The timestampdiff path must
    yield identical rollups and sessions under any session timezone
    (incl. a DST-observing one)."""
    ntz = spark.createDataFrame(
        [(i, f"2024-03-10 0{i}:0{i}:3{i}", float(i)) for i in range(1, 6)],
        "event_id long, tss string, value double",
    ).select(
        "event_id",
        F.col("tss").cast("timestamp_ntz").alias("ts"),
        "value",
        F.lit(1).alias("user_id"),
    )  # 2024-03-10 = US spring-forward day
    tz0 = spark.conf.get("spark.sql.session.timeZone")

    def run():
        r = sorted(
            temporal.resample_rollup(ntz).collect(),
            key=lambda x: x["bucket"],
        )
        s = sorted(
            temporal.sessionize(ntz, gap_seconds=3000.0).collect(),
            key=lambda x: x["session_id"],
        )
        return [tuple(x) for x in r], [tuple(x) for x in s]

    try:
        base = run()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = run()
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == shifted
