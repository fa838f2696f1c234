"""Explicit histogram-driven salting for skewed mega-cells (SURVEY.md §4).

AQE's skew-join splitting only helps shuffle joins; it does NOT split a
hot `groupBy().applyInPandas` group or fix a range layout.  So the
engine measures the cell histogram once per run and assigns each hot
cell a salt fan-out ``n_salt = ceil(cell_rows / target_rows)``; records
get ``salt = pmod(xxhash64(key), n_salt)``.  Aggregations then run
partial per (cell, salt) and final-combine per cell (SURVEY.md §2.4 A6),
so no single Python worker ever materializes an unsalted hot group.

The salt-factor table is tiny (only cells above target) and is
broadcast-joined — scalable to any input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_TARGET_ROWS = 100_000


def salt_plan(df: DataFrame, cell_col: str, target_rows: int = DEFAULT_TARGET_ROWS) -> DataFrame:
    """Histogram pass → (cell, n_salt) for cells exceeding `target_rows`."""
    return (
        df.groupBy(cell_col)
        .count()
        .where(F.col("count") > target_rows)
        .select(
            F.col(cell_col),
            F.ceil(F.col("count") / F.lit(target_rows)).cast("int").alias("n_salt"),
        )
    )


def salt_plan_presampled(
    sampled_df: DataFrame,
    cell_col: str,
    target_rows: int = DEFAULT_TARGET_ROWS,
    fraction: float = 0.02,
) -> DataFrame:
    """Salt plan from an ALREADY-SAMPLED input.

    Catalyst does NOT push `sample` below an ArrowEvalPython projection
    (verified in-plan), so sampling the UDF *output* costs a full UDF
    pass — the caller must sample the RAW input and run the enrichment
    chain on the 2% subset (tile_assign.enrich_pages does this).  Counts
    are scaled by 1/fraction exactly like salt_plan_sampled."""
    est = (
        sampled_df.groupBy(cell_col)
        .count()
        .select(
            F.col(cell_col),
            (F.col("count") / F.lit(fraction)).alias("est_rows"),
        )
        .where(F.col("est_rows") > target_rows)
    )
    return est.select(
        cell_col,
        F.ceil(F.col("est_rows") / F.lit(target_rows)).cast("int").alias("n_salt"),
    )


def salt_plan_sampled(
    df: DataFrame,
    cell_col: str,
    target_rows: int = DEFAULT_TARGET_ROWS,
    fraction: float = 0.02,
    seed: int = 42,
) -> DataFrame:
    """Sample-estimated salt plan: one cheap pass over `fraction` of rows
    instead of a full histogram.  Salting degree needs only the right
    ORDER of magnitude (underestimates merely leave a group ~2× larger),
    so a 2% sample is plenty for mega-cells; cells below ~50/fraction
    rows can't be estimated and can't be hot either."""
    est = (
        df.sample(fraction=fraction, seed=seed)
        .groupBy(cell_col)
        .count()
        .select(
            F.col(cell_col),
            (F.col("count") / F.lit(fraction)).alias("est_rows"),
        )
        .where(F.col("est_rows") > target_rows)
    )
    return est.select(
        cell_col,
        F.ceil(F.col("est_rows") / F.lit(target_rows)).cast("int").alias("n_salt"),
    )


def with_salt(
    df: DataFrame,
    cell_col: str,
    key_col: str,
    plan: DataFrame | None = None,
    target_rows: int = DEFAULT_TARGET_ROWS,
) -> DataFrame:
    """Add a `salt` column: 0 for cold cells, hash-spread for hot cells.

    The join is NULL-SAFE: the non-geocodable rows (cell NULL — roughly
    half of web pages) form the single largest "cell" and MUST be
    salted too, or `repartition(cell_prefix, salt)` sends them all to
    one reducer partition — a 5×10^11-row straggler at the 10^12-row
    posture (r2 fix; a plain equality join silently dropped the NULL
    plan row)."""
    if plan is None:
        plan = salt_plan(df, cell_col, target_rows)
    plan = plan.withColumnRenamed(cell_col, "__salt_cell")
    out = df.join(
        F.broadcast(plan), df[cell_col].eqNullSafe(F.col("__salt_cell")), "left"
    ).drop("__salt_cell")
    return out.withColumn(
        "salt",
        F.when(
            F.col("n_salt").isNotNull(),
            F.pmod(F.xxhash64(F.col(key_col)), F.col("n_salt")).cast("int"),
        ).otherwise(F.lit(0)),
    ).drop("n_salt")


def skew_ratio(df: DataFrame, cell_col: str) -> float:
    """max/median rows-per-cell — the per-stage skew metric (north_star)."""
    hist = df.groupBy(cell_col).count()
    stats = hist.agg(
        F.max("count").alias("mx"),
        F.expr("percentile_approx(count, 0.5)").alias("med"),
    ).first()
    if not stats or not stats["med"]:
        return 1.0
    return float(stats["mx"]) / float(stats["med"])
