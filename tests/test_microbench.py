"""Micro-kernel regression pins (VERDICT r3 next #10): best-of-3 wall
rates for the four hot kernels, floored at HALF the recorded clean
rates (BENCH/BASELINE.md methodology: H3 1.05M rows/s, S2 3.76M,
extraction 65k, python geocode ~43k) — generous enough to ride host
gusts (best-of-3 on an additive-noise host), tight enough that an
order-of-magnitude kernel regression fails CI instead of surfacing as
driver-bench noise."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest


def _best_of(fn, n=3):
    times = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        times.append(time.monotonic() - t0)
    return min(times)


@pytest.fixture(scope="module")
def latlon():
    rng = np.random.default_rng(42)
    n = 200_000
    lat = np.degrees(np.arcsin(rng.uniform(-0.999, 0.999, n)))
    lon = rng.uniform(-180.0, 180.0, n)
    return lat, lon


@pytest.mark.bench
def test_h3_kernel_rate(latlon):
    from gips_spark.functions import h3lite

    lat, lon = latlon
    h3lite.latlng_to_cell(lat[:1000], lon[:1000], 7)  # warm
    dt = _best_of(lambda: h3lite.latlng_to_cell(lat, lon, 7))
    rate = len(lat) / dt
    print(f"\nh3 latlng_to_cell: {rate/1e6:.2f}M rows/s")
    assert rate >= 525_000, f"{rate:.0f} rows/s < 525k floor"


@pytest.mark.bench
def test_s2_kernel_rate(latlon):
    from gips_spark.functions import s2

    lat, lon = latlon
    s2.latlng_to_cell(lat[:1000], lon[:1000], 13)  # warm
    dt = _best_of(lambda: s2.latlng_to_cell(lat, lon, 13))
    rate = len(lat) / dt
    print(f"\ns2 latlng_to_cell: {rate/1e6:.2f}M rows/s")
    assert rate >= 1_880_000, f"{rate:.0f} rows/s < 1.88M floor"


@pytest.fixture(scope="module")
def page_pdf(spark):
    from gips_spark.sources import fixtures

    return fixtures.gen_pages(spark, 6000).select("url", "html").toPandas()


@pytest.mark.bench
def test_extraction_kernel_rate(page_pdf):
    from gips_spark.functions import textx

    html = page_pdf["html"]
    textx.extract_text(html.iloc[:100])  # warm
    dt = _best_of(lambda: textx.extract_text(html))
    rate = len(html) / dt
    print(f"\nextract_text: {rate/1e3:.1f}k rows/s")
    assert rate >= 32_500, f"{rate:.0f} rows/s < 32.5k floor"


@pytest.mark.bench
def test_geocode_kernel_rate(page_pdf):
    from gips_spark.functions import textx

    text = textx.extract_text(page_pdf["html"])
    url = page_pdf["url"]
    textx.geocode(url.iloc[:100], text.iloc[:100])  # warm
    dt = _best_of(lambda: textx.geocode(url, text))
    rate = len(url) / dt
    print(f"\npython geocode: {rate/1e3:.1f}k rows/s")
    assert rate >= 21_500, f"{rate:.0f} rows/s < 21.5k floor"
