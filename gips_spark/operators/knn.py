"""M4 — exact kNN join via cell-directory pruning + ring expansion.

Semantics (FIXTURES.md golden): for each query point, the k nearest
geocoded pages by exact haversine, ties broken by url ascending.

Plan (SURVEY.md J5, adapted so exactness never depends on hex-grid edge
geometry — see functions/h3lite.py docstring):

 1. Collect the cell directory slice (cell → n_rows, bbox).  Directory
    is cell-granular (≪ rows; res-4 rollup first if it ever outgrows
    the driver — the same table, one groupBy coarser).
 2. Per query (vectorized numpy over all cells): lower-bound distance
    to each cell = haversine to the bbox-clamped point.  Sort cells by
    bound; take cells until ≥k cumulative rows; D = max upper bound
    (haversine to farthest bbox corner) among them; candidates = all
    cells with lower bound ≤ D.  This is ring expansion in distance
    space with a closure guarantee: no point outside the candidate set
    can beat the k-th best.
 3. Broadcast (query_id, h3_7) candidate pairs; equi-join pages on
    h3_7 (JVM-side); exact haversine as a Column expression (codegen,
    no Arrow hop); Window top-k per query (Catalyst rewrites
    row_number()<=k into per-partition top-k).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from gips_spark.functions.geom import haversine_m
from gips_spark.functions.udfs import haversine_expr


def _candidate_cells(directory_pdf: pd.DataFrame, queries_pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-side candidate pruning → DataFrame(query_id, h3_7)."""
    cells = directory_pdf
    c_n = cells["n_rows"].to_numpy()
    out_q, out_c = [], []
    min_lat = cells["min_lat"].to_numpy()
    max_lat = cells["max_lat"].to_numpy()
    min_lon = cells["min_lon"].to_numpy()
    max_lon = cells["max_lon"].to_numpy()
    ids = cells["h3_7"].to_numpy()
    for _, q in queries_pdf.iterrows():
        qla, qlo, k = q["lat"], q["lon"], int(q["k"])
        # lower bound: haversine to the point clamped into the bbox
        lb = haversine_m(
            qla, qlo, np.clip(qla, min_lat, max_lat), np.clip(qlo, min_lon, max_lon)
        )
        # upper bound: farthest bbox corner
        corners = [
            haversine_m(qla, qlo, min_lat, min_lon),
            haversine_m(qla, qlo, min_lat, max_lon),
            haversine_m(qla, qlo, max_lat, min_lon),
            haversine_m(qla, qlo, max_lat, max_lon),
        ]
        ub = np.maximum.reduce(corners)
        order = np.argsort(lb, kind="stable")
        cum = np.cumsum(c_n[order])
        take = int(np.searchsorted(cum, k) + 1)
        take = min(take, len(order))
        radius = ub[order[:take]].max() if take else 0.0
        cand = ids[lb <= radius]
        out_q.extend([q["query_id"]] * len(cand))
        out_c.extend(cand.tolist())
    return pd.DataFrame({"query_id": out_q, "h3_7": out_c})


def knn_join(
    spark,
    enriched: DataFrame,
    queries: DataFrame,
    directory: DataFrame,
) -> DataFrame:
    """→ (query_id, rank, url, dist_m) — exact kNN, ties by url asc."""
    directory_pdf = directory.toPandas()
    queries_pdf = queries.toPandas()
    cand_pdf = _candidate_cells(directory_pdf, queries_pdf)
    cand = spark.createDataFrame(cand_pdf)

    pts = enriched.where(F.col("geocode_src") != "none").select(
        "url", "lat", "lon", "h3_7"
    )
    qdf = queries.select(
        F.col("query_id"),
        F.col("lat").alias("q_lat"),
        F.col("lon").alias("q_lon"),
        F.col("k"),
    )
    joined = (
        pts.join(F.broadcast(cand), "h3_7")
        .join(F.broadcast(qdf), "query_id")
        .withColumn(
            "dist_m",
            haversine_expr(F.col("lat"), F.col("lon"), F.col("q_lat"), F.col("q_lon")),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("url").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "url", "dist_m")
    )


def _kring_candidates(
    directory_pdf: pd.DataFrame, queries_pdf: pd.DataFrame
) -> pd.DataFrame:
    """H3 k-ring candidate generation (the literal SURVEY.md J5 plan):
    expand rings around each query's cell until the occupied cells hold
    ≥k rows, then CLOSE the candidate set with the directory distance
    bound (all cells whose bbox lower-bound ≤ the ring set's upper
    bound) — so exactness never depends on hex-edge geometry."""
    from gips_spark.functions import h3lite

    occupied = set(directory_pdf["h3_7"].tolist())
    n_by_cell = dict(zip(directory_pdf["h3_7"], directory_pdf["n_rows"]))
    min_lat = directory_pdf["min_lat"].to_numpy()
    max_lat = directory_pdf["max_lat"].to_numpy()
    min_lon = directory_pdf["min_lon"].to_numpy()
    max_lon = directory_pdf["max_lon"].to_numpy()
    ids = directory_pdf["h3_7"].to_numpy()
    out_q, out_c = [], []
    for _, q in queries_pdf.iterrows():
        qla, qlo, k = q["lat"], q["lon"], int(q["k"])
        qcell = int(h3lite.latlng_to_cell(np.array([qla]), np.array([qlo]), 7)[0])
        r = 0
        ring_cells: list[int] = []
        while r <= 64:
            ring_cells = [c for c in h3lite.k_ring(qcell, r).tolist() if c in occupied]
            if sum(n_by_cell[c] for c in ring_cells) >= k:
                break
            r += 1
        # closure: upper bound over the ring set, then take every
        # occupied cell whose lower bound beats it
        sel = directory_pdf["h3_7"].isin(ring_cells).to_numpy()
        if not sel.any() or sum(n_by_cell[c] for c in ring_cells) < k:
            # sparse tail: ring expansion exhausted without k rows in
            # reach (or cross-face gap) — fall back to the full directory
            out_q.extend([q["query_id"]] * len(ids))
            out_c.extend(ids.tolist())
            continue
        ub = np.maximum.reduce(
            [
                haversine_m(qla, qlo, min_lat[sel], min_lon[sel]),
                haversine_m(qla, qlo, min_lat[sel], max_lon[sel]),
                haversine_m(qla, qlo, max_lat[sel], min_lon[sel]),
                haversine_m(qla, qlo, max_lat[sel], max_lon[sel]),
            ]
        ).max()
        lb = haversine_m(
            qla, qlo, np.clip(qla, min_lat, max_lat), np.clip(qlo, min_lon, max_lon)
        )
        cand = ids[lb <= ub]
        out_q.extend([q["query_id"]] * len(cand))
        out_c.extend(cand.tolist())
    return pd.DataFrame({"query_id": out_q, "h3_7": out_c})


def knn_join_kring(
    spark, enriched: DataFrame, queries: DataFrame, directory: DataFrame
) -> DataFrame:
    """kNN via H3 k-ring expansion + broadcast candidate pruning (same
    output contract as knn_join; tested equal to brute force)."""
    directory_pdf = directory.toPandas()
    queries_pdf = queries.toPandas()
    cand = spark.createDataFrame(_kring_candidates(directory_pdf, queries_pdf))
    pts = enriched.where(F.col("geocode_src") != "none").select(
        "url", "lat", "lon", "h3_7"
    )
    qdf = queries.select(
        F.col("query_id"),
        F.col("lat").alias("q_lat"),
        F.col("lon").alias("q_lon"),
        F.col("k"),
    )
    joined = (
        pts.join(F.broadcast(cand), "h3_7")
        .join(F.broadcast(qdf), "query_id")
        .withColumn(
            "dist_m",
            haversine_expr(F.col("lat"), F.col("lon"), F.col("q_lat"), F.col("q_lon")),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("url").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "url", "dist_m")
    )


def knn_bruteforce(enriched: DataFrame, queries: DataFrame) -> DataFrame:
    """O(n·q) exact baseline (cross join) — oracle for tests/bench."""
    pts = enriched.where(F.col("geocode_src") != "none").select("url", "lat", "lon")
    qdf = queries.select(
        F.col("query_id"), F.col("lat").alias("q_lat"), F.col("lon").alias("q_lon"), "k"
    )
    joined = pts.crossJoin(F.broadcast(qdf)).withColumn(
        "dist_m",
        haversine_expr(F.col("lat"), F.col("lon"), F.col("q_lat"), F.col("q_lon")),
    )
    w = W.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("url").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "url", "dist_m")
    )
