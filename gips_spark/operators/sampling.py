"""Deterministic sampling / split assignment for training-data pipelines.

The ops a 100-TB corpus pipeline needs around dedup/quality: reproducible
train/val/test assignment and per-stratum subsampling.  Both are pure
narrow projections — ZERO shuffle, zero Python, layout- and
partitioning-independent (the assignment depends only on the row's id,
never on `monotonically_increasing_id`, `rand()`, or partition layout —
the r4-ADVICE lesson from the IVF Bernoulli seed applied from the start).

Reference parity: the reference has no sampling surface (its unit is the
whole scene/tile inventory); this family is part of SURVEY §2's
"training-data pipeline" extension mandate.

Hash methods:
* ``xxhash64`` (default) — production quality, JVM codegen.
* ``portable`` — a double multiplicative-congruential mix over prime
  moduli, expressible verbatim in ANSI SQL (the DuckDB oracle recomputes
  it exactly).  Collision structure repeats every 1,000,003 ids, so it
  is for cross-engine verification and tests, NOT for >10^6-row
  production splits — use the default there.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

#: portable-hash constants (Knuth multiplicative + two prime moduli)
_P_PRE = 1_000_003
_A = 2_654_435_761
_B = 12_345
_P_MIX = 999_983


def hash_bucket(
    id_col: str | Column,
    buckets: int = 1000,
    method: str = "xxhash64",
    seed: int = 42,
) -> Column:
    """Deterministic bucket in [0, buckets) from a row id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if method == "xxhash64":
        return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(buckets))
    if method == "portable":
        if seed != 42:
            # the fixed-permutation verification path has no seed slot:
            # silently ignoring it would hand back byte-identical
            # "independent" samples (code-review r5)
            raise ValueError(
                "method='portable' is a FIXED permutation (cross-engine "
                "verification path) and ignores seed — use the default "
                "seed=42, or method='xxhash64' for seeded draws"
            )
        # ((id % P_PRE) * A + B) % P_MIX % buckets — every intermediate
        # is <= 1e6 * 2.66e9 ≈ 2.7e15, comfortably inside int64 in both
        # engines; id must be non-negative (true for all repo id columns)
        return ((c % _P_PRE) * F.lit(_A) + F.lit(_B)) % F.lit(_P_MIX) % F.lit(
            buckets
        )
    raise ValueError(f"unknown hash method {method!r}")


def stratified_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    buckets: int = 1000,
    method: str = "xxhash64",
    seed: int = 42,
) -> DataFrame:
    """Append a ``split`` column by cumulative hash-bucket boundaries.

    Uniform hashing makes the split stratified within ANY grouping
    column for free (each stratum sees the same bucket distribution).
    Fractions must sum to 1 (the last label absorbs rounding)."""
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {total}, expected 1.0")
    b = hash_bucket(id_col, buckets, method, seed)
    expr = F.lit(fractions[-1][0])
    cum = 0.0
    branches = []
    for label, frac in fractions[:-1]:
        cum += frac
        branches.append((int(round(cum * buckets)), label))
    for edge, label in reversed(branches):
        expr = F.when(b < F.lit(edge), F.lit(label)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    buckets: int = 1000,
    method: str = "xxhash64",
    seed: int = 42,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction: row survives iff its
    hash bucket < fraction·buckets for its stratum (strata missing from
    ``fractions`` are dropped).  Exactly reproducible across runs,
    partitionings, and engines (with ``method='portable'``)."""
    b = hash_bucket(id_col, buckets, method, seed)
    thr = F.create_map(
        *[
            x
            for k, v in sorted(fractions.items())
            for x in (F.lit(k), F.lit(int(round(v * buckets))))
        ]
    )
    return df.where(b < F.coalesce(thr[F.col(strata_col)], F.lit(0)))


def group_quota(
    df: DataFrame,
    group_col: str,
    quota: int,
    id_col: str = "doc_id",
    method: str = "xxhash64",
    seed: int = 42,
    prefilter_buckets: int | None = 64,
) -> DataFrame:
    """Cap rows per group at `quota`, keeping a DETERMINISTIC
    pseudo-random subset (the per-domain / per-source quota pass a
    corpus pipeline runs before training-set assembly).

    Selection order inside a group is (hash_bucket(id, 2^20), id) — a
    deterministic shuffle independent of input layout, so re-runs and
    repartitionings keep the same rows; plain `id` order would bias
    toward early ids.

    Scale shape (r6): the final top-`quota` window partitions by the
    group key alone, which at 100 TB would concentrate a 10^8-row
    mega-domain in ONE task.  So a bucketed LOCAL top-quota runs first:
    a window over ``(group, order_hash % prefilter_buckets)`` keeps at
    most `quota` rows per bucket, bounding any stage-1 partition at
    ~group_rows/prefilter_buckets and the final window's input at
    ``prefilter_buckets × quota`` rows per group.  Output is BIT-
    IDENTICAL to the single-window plan (pinned by pytest): a row
    dropped by its bucket already has ≥ quota rows of the same group
    ahead of it in the global (hash, id) order, so its group rank
    could never be ≤ quota.  ``prefilter_buckets=None`` restores the
    single-window plan (used by the equality pin).

    Returns the surviving rows plus their ``qrank`` (1-based)."""
    order_hash = hash_bucket(id_col, 1 << 20, method=method, seed=seed)
    if prefilter_buckets is not None and prefilter_buckets > 1:
        # bucket from the SAME deterministic order hash (no extra seed
        # slot needed — the portable method has none), uniform w.r.t.
        # the order because pmod(h, B) is independent of h's rank order
        bkt = F.pmod(order_hash, F.lit(prefilter_buckets))
        w1 = W.partitionBy(F.col(group_col), bkt).orderBy(
            order_hash.asc(), F.col(id_col).asc()
        )
        df = (
            df.withColumn("__gq_r1", F.row_number().over(w1))
            .where(F.col("__gq_r1") <= quota)
            .drop("__gq_r1")
        )
    w = W.partitionBy(group_col).orderBy(order_hash.asc(), F.col(id_col).asc())
    return (
        df.withColumn("qrank", F.row_number().over(w))
        .where(F.col("qrank") <= quota)
    )
