"""Relational inventory ops vs duckdb; multimodal plumbing; streaming."""

import duckdb
import numpy as np
import pyspark.sql.functions as F

from gips_spark.operators import multimodal, relational, textops


def test_inventory_filters_vs_duckdb(spark, scenes):
    got = relational.inventory(
        scenes,
        date_range=("2025-03-01", "2025-09-30"),
        doy_window=(100, 250),
        sensors=["landsat", "modis"],
        max_cloud=50.0,
    ).count()
    pdf = scenes.toPandas()
    want = duckdb.sql(
        """
        select count(*) from pdf
        where acq_date between date '2025-03-01' and date '2025-09-30'
          and dayofyear(acq_date) between 100 and 250
          and sensor in ('landsat', 'modis') and cloud_pct < 50.0
        """
    ).fetchone()[0]
    assert got == want


def test_best_scene_per_tile_date(spark, scenes):
    best = relational.best_scene_per_tile_date(scenes)
    dups = (
        best.groupBy("tile_id", "acq_date").count().where(F.col("count") > 1).count()
    )
    assert dups == 0
    assert best.count() == scenes.select("tile_id", "acq_date").distinct().count()


def test_calendar_and_summary_vs_duckdb(spark, scenes):
    pdf = scenes.toPandas()
    cal = relational.coverage_calendar(scenes).toPandas()
    want = duckdb.sql(
        "select acq_date, count(distinct tile_id) n_tiles from pdf group by 1 order by 1"
    ).df()
    assert (cal["n_tiles"].to_numpy() == want["n_tiles"].to_numpy()).all()
    summ = relational.inventory_summary(scenes).first()
    w = duckdb.sql(
        "select count(distinct acq_date), count(distinct tile_id), count(distinct sensor), count(*) from pdf"
    ).fetchone()
    assert (summ["n_dates"], summ["n_tiles"], summ["n_sensors"], summ["n_scenes"]) == w


def test_missing_products_anti_join(spark, scenes):
    done = scenes.select("scene_id").limit(100)
    missing = relational.missing_products(scenes, done)
    assert missing.count() == scenes.count() - 100
    assert missing.join(done, "scene_id", "inner").count() == 0


def test_range_join_scenes_in_window(spark, scenes, pages):
    out = relational.scenes_in_window(scenes, pages)
    joined = out.join(
        scenes.select("scene_id", "acq_date", "sensor"), "scene_id"
    ).withColumn(
        "lat_days",
        F.coalesce(
            *[
                F.when(F.col("sensor") == k, F.lit(v))
                for k, v in relational.ASSET_LATENCY_DAYS.items()
            ]
        ),
    )
    bad = joined.where(
        (F.col("warc_ts") < F.col("acq_date").cast("timestamp"))
        | (
            F.col("warc_ts")
            >= F.date_add(F.col("acq_date"), F.col("lat_days")).cast("timestamp")
        )
    ).count()
    assert bad == 0 and out.count() > 0


def test_tile_timeseries_window(spark, scenes):
    ts = relational.tile_timeseries(scenes).where(F.col("tile_id") == "h00v00")
    pdf = ts.orderBy("acq_date").toPandas()
    if len(pdf) >= 3:
        v = pdf["v"].to_numpy()
        assert np.isclose(pdf["moving_mean"].iloc[2], v[:3][-3:].mean())
        assert pdf["prev_v"].iloc[1] == v[0]


def test_textops_vs_duckdb(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    analyzed = textops.analyze_documents(docs).cache()
    got = analyzed.agg(
        F.sum("n_chars").alias("c"), F.sum("n_tokens_ws").alias("t")
    ).first()
    pdf = docs.toPandas()
    want_c = duckdb.sql("select sum(length(text)) from pdf").fetchone()[0]
    assert got["c"] == want_c
    hist = textops.language_histogram(analyzed)
    assert hist.agg(F.sum("n_docs")).first()[0] == docs.count()


def test_multimodal_plumbing(spark):
    assets = multimodal.make_assets(spark, 24)
    feats = multimodal.extract_features(assets, resize_to=4, sample_every=2).cache()
    pdf = feats.toPandas()
    # videos (n_frames=8, every 2) → 4 rows; images/audio → 1 row
    per_kind = pdf.groupby("kind")["asset_id"].nunique()
    rows_video = len(pdf[pdf["kind"] == "video"]) / per_kind["video"]
    assert rows_video == 4
    assert all(len(f) == 18 for f in pdf["features"])  # 4x4 + mean,std
    # determinism
    pdf2 = multimodal.extract_features(assets, resize_to=4, sample_every=2).toPandas()
    a = pdf.sort_values(["asset_id", "frame"]).reset_index(drop=True)
    b = pdf2.sort_values(["asset_id", "frame"]).reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a["features"], b["features"]))
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_or_raise()


def test_stateful_crawl_sessions(spark, pages, tmp_path):
    """applyInPandasWithState: per-url session stats equal batch truth."""
    from gips_spark.streaming import stateful

    in_path = str(tmp_path / "sin")
    pages.limit(400).write.parquet(in_path)
    snap = stateful.run_available_now_memory(
        spark, in_path, str(tmp_path / "sck"), name="crawl_state_t"
    ).toPandas()
    truth = (
        spark.read.parquet(in_path)
        .groupBy("url")
        .agg(
            F.count("*").alias("n_crawls"),
            F.min("warc_ts").alias("first_ts"),
            F.max("warc_ts").alias("last_ts"),
        )
        .toPandas()
    )
    g = snap.sort_values("url").reset_index(drop=True)
    w = truth.sort_values("url").reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["url"] == w["url"]).all()
    assert (g["n_crawls"].to_numpy() == w["n_crawls"].to_numpy()).all()
    assert (g["first_ts"].to_numpy() == w["first_ts"].to_numpy()).all()
    assert (g["last_ts"].to_numpy() == w["last_ts"].to_numpy()).all()


def test_streaming_cell_counts(spark, pages, tmp_path):
    from gips_spark.streaming import ingest

    # unique urls in the input: which crawl survives dropDuplicates is
    # arbitrary on both sides, so feed one version per url
    in_path = str(tmp_path / "in")
    pages.limit(500).dropDuplicates(["url"]).write.parquet(in_path)
    out_path = str(tmp_path / "out")
    ingest.run_available_now(spark, in_path, out_path, str(tmp_path / "ck"))
    res = spark.read.parquet(out_path)
    assert res.count() > 0
    assert res.where(F.col("n_pages") <= 0).count() == 0
    # Append-mode contract: windows newer than the final watermark stay in
    # state (by design), but every EMITTED (window, cell) row must carry
    # its exact final count — compare against the batch ground truth.
    from gips_spark.operators import tile_assign

    batch = tile_assign.enrich_pages(
        spark.read.parquet(in_path), do_repartition=False
    ).where(F.col("geocode_src") != "none")
    truth = (
        batch.groupBy(
            F.window("warc_ts", "1 day").alias("w"), F.col("h3_7")
        )
        .agg(F.count(F.lit(1)).alias("n_true"))
        .select(F.col("w.start").alias("window_start"), "h3_7", "n_true")
    )
    joined = res.join(truth, ["window_start", "h3_7"], "left")
    assert joined.where(
        F.col("n_true").isNull() | (F.col("n_true") != F.col("n_pages"))
    ).count() == 0
    # and the un-emitted remainder is exactly the open-window tail
    total = res.agg(F.sum("n_pages")).first()[0]
    assert 0 < total <= batch.count()


def test_streaming_session_windows(spark, pages, tmp_path):
    """§2.9 session windows: streamed gap-sessions (session_window +
    watermark, append mode) agree with the batch session_window result
    for every emitted session."""
    from gips_spark.streaming import ingest

    in_path = str(tmp_path / "sw_in")
    pages.limit(800).write.parquet(in_path)
    out_path = str(tmp_path / "sw_out")
    ingest.run_sessions_available_now(
        spark, in_path, out_path, str(tmp_path / "sw_ck"), gap="2 days"
    )
    res = spark.read.parquet(out_path)
    assert res.count() > 0

    batch = (
        spark.read.parquet(in_path)
        .groupBy(F.session_window(F.col("warc_ts"), "2 days").alias("w"), F.col("url"))
        .agg(F.count(F.lit(1)).alias("n_true"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "url",
            "n_true",
        )
    )
    j = res.join(batch, ["session_start", "session_end", "url"], "left")
    assert j.where(
        F.col("n_true").isNull() | (F.col("n_true") != F.col("n_crawls"))
    ).count() == 0


def test_gips_raw_codec_and_resize():
    """REAL decode path: codec round-trips exactly; bilinear resize
    preserves linear ramps (the defining property) and the identity."""
    import pytest

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (3, 16, 16), dtype=np.uint8)
    payload = multimodal.encode_gips_raw(frames)
    back = multimodal.decode_gips_raw(payload)
    assert back.shape == (3, 16, 16)
    assert np.array_equal((back * 255.0).round().astype(np.uint8), frames)

    # header validation is real
    with pytest.raises(ValueError):
        multimodal.decode_gips_raw(b"JPEG" + payload[4:])
    with pytest.raises(ValueError):
        multimodal.decode_gips_raw(payload[:-1])

    # bilinear on a linear ramp is exact (up to fp), identity is exact
    yy, xx = np.mgrid[0:16, 0:16]
    ramp = (2.0 * xx + 3.0 * yy) / 100.0
    up = multimodal.bilinear_resize(ramp, 32, 32)
    yy2, xx2 = np.mgrid[0:32, 0:32]
    # sample positions of the output grid in input coords
    ys = (yy2 + 0.5) * 16 / 32 - 0.5
    xs = (xx2 + 0.5) * 16 / 32 - 0.5
    want = (2.0 * np.clip(xs, 0, 15) + 3.0 * np.clip(ys, 0, 15)) / 100.0
    assert np.allclose(up, want, atol=1e-12)
    assert np.allclose(multimodal.bilinear_resize(ramp, 16, 16), ramp, atol=1e-12)


def test_multimodal_features_match_numpy_reference(spark):
    """End-to-end: Spark features over REAL payloads == driver-side
    numpy reference (decode → sample → resize → concat)."""
    assets = multimodal.make_assets(spark, 12)
    rows = assets.collect()
    got = {
        (r["asset_id"], r["frame"]): np.array(r["features"])
        for r in multimodal.extract_features(
            assets, resize_to=4, sample_every=3
        ).collect()
    }
    for r in rows:
        frames = multimodal.decode_gips_raw(bytes(r["payload"]))
        for fr in range(0, r["n_frames"], 3):
            img = frames[fr]
            small = multimodal.bilinear_resize(img, 4, 4)
            want = np.concatenate([small.ravel(), [img.mean(), img.std()]]).astype(
                np.float32
            )
            assert np.array_equal(got[(r["asset_id"], fr)], want)


def test_decode_stats_matches_numpy_reference(spark):
    """decode_stats (the QA-stats surface behind mm_decode_stats) ==
    driver-side numpy reference in float64; header dims come from the
    decoded payload, and the 16→8 resize checksum pins every resized
    pixel via position weights."""
    ids = spark.range(17).select(F.col("id").alias("doc_id"))
    assets = multimodal.pattern_assets(ids, "doc_id")
    got = {
        (r["asset_id"], r["frame"]): r
        for r in multimodal.decode_stats(assets, resize_to=8, sample_every=2).collect()
    }
    wgt = np.arange(1, 65, dtype=np.float64)
    n_rows = 0
    for r in assets.collect():
        frames = multimodal.decode_gips_raw(bytes(r["payload"]))
        assert frames.shape == (r["n_frames"], 16, 16)
        for fr in range(0, r["n_frames"], 2):
            img = frames[fr]
            small = multimodal.bilinear_resize(img, 8, 8)
            row = got[(r["asset_id"], fr)]
            n_rows += 1
            assert (row["width"], row["height"]) == (16, 16)
            assert row["mean_px"] == img.mean()
            assert row["std_px"] == img.std()
            assert row["resize_checksum"] == small.ravel() @ wgt
    assert n_rows == len(got)
