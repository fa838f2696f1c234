"""QA bitfield unpack (X5) vs straight-line numpy/duckdb oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from gips_spark.operators import qa


def test_qa_unpack_scalar_vs_duckdb(spark):
    rng = np.random.default_rng(5)
    words = rng.integers(0, 65536, 500, dtype=np.int64)
    pdf = pd.DataFrame({"qa": words})
    df = spark.createDataFrame(pdf)
    got = (
        qa.qa_unpack(df, "qa")
        .select("qa", "cloud_state", "cloud_shadow", "land_water", "aerosol")
        .toPandas()
        .sort_values("qa")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """SELECT qa, CAST((qa >> 0) & 3 AS INT) cloud_state,
                  CAST((qa >> 2) & 1 AS INT) cloud_shadow,
                  CAST((qa >> 3) & 7 AS INT) land_water,
                  CAST((qa >> 6) & 3 AS INT) aerosol
           FROM pdf ORDER BY qa"""
    ).df().reset_index(drop=True)
    assert got.equals(want.astype(got.dtypes.to_dict()))


def test_qa_keep_mask_semantics(spark):
    # cloud_state 0..3 × shadow 0/1 grid: keep == state∈{0,3} and no shadow
    rows = [(s | (sh << 2),) for s in range(4) for sh in (0, 1)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["qa"]))
    got = {
        r["qa"]: r["keep"]
        for r in qa.qa_cloud_keep_mask(df, "qa").collect()
    }
    for s in range(4):
        for sh in (0, 1):
            assert got[s | (sh << 2)] == (s in (0, 3) and sh == 0)


def test_qa_unpack_array_matches_scalar(spark):
    """Array variant (raster-chunk shape) is element-wise identical to
    the scalar unpack, and the plan stays JVM-side (no Arrow/Python)."""
    import contextlib
    import io

    rng = np.random.default_rng(6)
    pdf = pd.DataFrame(
        {
            "chunk_id": range(20),
            "qa_pixels": [
                rng.integers(0, 65536, 64).astype(np.int64).tolist()
                for _ in range(20)
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    arr = qa.qa_unpack_array(df, "qa_pixels").toPandas()
    flat = df.select(
        "chunk_id", F.explode("qa_pixels").alias("qa")
    )
    sc = qa.qa_unpack(flat, "qa").toPandas()
    for _, row in arr.iterrows():
        sub = sc[sc["chunk_id"] == row["chunk_id"]]
        assert list(row["cloud_state"]) == sub["cloud_state"].tolist()
        assert list(row["land_water"]) == sub["land_water"].tolist()

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        qa.qa_unpack_array(df, "qa_pixels").explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
