"""PageRank + TF-IDF oracles.

The driver query's link graph has no dangling nodes by construction, so
the numpy cross-check here uses a graph WITH one (plus a rank-mass
conservation pin and the checkpoint path).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gips_spark.operators import graph, textops


def _np_pagerank(edges, n, iters, d=0.85):
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[out_deg == 0].sum()
        s = np.zeros(n)
        for a, b in edges:
            s[b] += r[a] / out_deg[a]
        r = (1 - d) / n + d * (s + dangling / n)
    return r


@pytest.mark.parametrize("iters", [1, 4, 7])
def test_pagerank_matches_numpy_with_dangling(spark, iters):
    # node 4 has NO out-edges (dangling); node 5 only appears as dst
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 4), (2, 4), (1, 5), (5, 0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(e, num_iters=iters, checkpoint_every=3).collect()
    }
    want = _np_pagerank(edges, 6, iters)
    assert set(got) == set(range(6))
    for i in range(6):
        assert got[i] == pytest.approx(want[i], abs=1e-12)
    # damped PageRank conserves total rank mass exactly (dangling
    # redistribution included)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_reliable_checkpoint(spark, tmp_path):
    edges = [(0, 1), (1, 0), (1, 2), (2, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(
            e,
            num_iters=4,
            checkpoint_every=2,
            use_reliable_checkpoint=True,
            checkpoint_dir=str(tmp_path / "ckpt"),
        ).collect()
    }
    want = _np_pagerank(edges, 3, 4)
    for i in range(3):
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_tfidf_manual(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b b c"),
            (1, "a a d"),
            (2, "c c c e"),
        ],
        "doc_id long, text string",
    )
    out = textops.tfidf_top_terms(docs, k=2).collect()
    n = 3.0

    def idf(df_):
        return math.log((n + 1.0) / (df_ + 1.0)) + 1.0

    # doc 0: b tf=2 df=1 → 2*idf(1); c tf=1 df=2; a tf=1 df=2 → tie on
    # score (a, c equal) broken by tok asc → 'a' takes rank 2
    by = {(r["doc_id"], r["trank"]): (r["tok"], r["score"]) for r in out}
    assert by[(0, 1)][0] == "b"
    assert by[(0, 1)][1] == pytest.approx(2 * idf(1), abs=1e-12)
    assert by[(0, 2)][0] == "a"
    assert by[(1, 1)][0] == "a"  # tf=2 beats d's higher idf? 2*idf(2) vs 1*idf(1)
    assert 2 * idf(2) > 1 * idf(1)
    assert by[(2, 1)] == ("c", pytest.approx(3 * idf(2), abs=1e-12))
    assert len(out) == 6
