"""Link-graph analytics: distributed PageRank.

A web-scale text engine's third graph primitive next to the two
connected-components variants in dedup.py (min-label propagation,
large-star/small-star).  PageRank here is the classic damped
power-iteration expressed as DataFrame joins — NO driver-side adjacency,
no RDDs, no Python in the loop.

Scale notes (10^9-node graphs):
* per iteration: one equi-join edges⋈ranks on src + one groupBy(dst)
  sum — both shuffle on node id; Spark reuses the edge side's hash
  partitioning across iterations once AQE materializes it.
* out-degrees are computed ONCE and joined into the edge list up front,
  so the loop never re-aggregates the edge table.
* dangling mass (nodes with no out-edges) is a per-iteration SCALAR
  aggregate — O(1) rows to the driver, never row-scaled.
* lineage is truncated every ``checkpoint_every`` rounds via the same
  local/reliable checkpoint seam as dedup's CC loops (dedup._ckpt_fn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gips_spark.operators.dedup import _ckpt_fn


def pagerank(
    edges: DataFrame,
    num_iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 4,
    use_reliable_checkpoint: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """→ (node, rank) after ``num_iters`` damped power iterations.

    Node set = src ∪ dst.  Update rule (mirrored verbatim by the SQL
    oracle so results are bit-comparable at 6 dp):

        rank' = (1-d)/N + d * (Σ_in rank/out_deg + dangling_mass/N)
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # loop-invariant frames persisted ONCE (r6: they were unpersisted
    # lineage, recomputed by every iteration's joins — ADVICE r5)
    nodes = nodes.persist()
    n_nodes = nodes.count()  # scalar; the only full-graph count (also
    # materializes the nodes cache)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")).persist()
    # weight each edge once: contribution factor 1/out_deg
    ew = e.join(deg, "src").persist()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    ckpt = _ckpt_fn(ranks, use_reliable_checkpoint, checkpoint_dir)
    base = (1.0 - damping) / n_nodes
    # each iteration is persisted and MATERIALIZED (by the dangling
    # scalar action) before the previous one is unpersisted, so every
    # iteration's joins execute exactly once — without this, the
    # per-iteration .first() re-runs all prior iterations between
    # checkpoints (quadratic recompute; code-review r5)
    prev = None
    for i in range(num_iters):
        ranks = ranks.persist()
        # dangling nodes: rank mass with no out-edges, redistributed
        # uniformly — a scalar agg (anti-join against deg), never wide.
        # Also the action that materializes this iteration's cache.
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        if prev is not None:
            prev.unpersist()
        prev = ranks
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(dangling / n_nodes))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < num_iters:
            ranks = ckpt(ranks)
    ranks = ranks.persist()
    ranks.count()  # materialize the final frame off the cached parent
    if prev is not None:
        prev.unpersist()
    nodes.unpersist()
    deg.unpersist()
    ew.unpersist()
    # the returned `ranks` frame stays persisted — the caller owns
    # unpersisting it once consumed (documented contract; ADVICE r5)
    return ranks
