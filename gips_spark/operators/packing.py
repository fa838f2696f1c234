"""Training-sequence packing: lay documents out into fixed-token-budget
packs for LLM pretraining (the public GPT-style concatenate-and-chunk
layout, and a no-straddle next-fit variant).

Two operators:

* :func:`pack_sequences` — the GPT-2/3-style packing: within a
  deterministic hash bucket, documents are conceptually concatenated in
  (bucket, doc_id) order and the token stream sliced into fixed
  ``pack_tokens`` windows; a document may STRADDLE two packs (standard
  for causal-LM training where an EOS separates docs).  Pure JVM — one
  window cumsum per bucket — and exactly mirrorable in SQL.
* :func:`pack_sequences_nextfit` — the no-straddle variant (greedy
  next-fit): a doc that does not fit the current pack's remaining space
  opens a new pack; an oversize doc (> pack_tokens) gets a pack of its
  own, flagged.  Intrinsically a sequential scan per bucket → Arrow
  ``applyInPandas`` over buckets (numpy loop, no per-row Python).

Scale (100 TB): both shuffle ONCE on ``bucket`` (deterministic
layout-independent hash of doc_id — same determinism contract as
operators/sampling.py).  Bucket count is the parallelism knob: packs
never span buckets, so 10^5 buckets keep every window/pandas group at
~corpus/10^5 rows.  Ordering inside a bucket is total ((bucket,
doc_id)), so output is reproducible under any input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from gips_spark.operators.sampling import hash_bucket


def _with_tokens(
    docs: DataFrame, id_col: str, text_col: str, tokens_col: str | None
):
    if tokens_col is not None:
        tok = F.col(tokens_col).cast("long")
    else:
        from gips_spark.operators.textops import ws_tokens

        # ws_tokens drops phantom '' tokens from tab/newline-led text
        # (code-review r5) and treats NULL as empty
        tok = F.size(ws_tokens(F.col(text_col))).cast("long")
    return docs.select(F.col(id_col).alias("doc_id"), tok.alias("n_tokens"))


def pack_sequences(
    docs: DataFrame,
    pack_tokens: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """→ (doc_id, n_tokens, bucket, start_tok, pack_seq, offset_in_pack).

    ``start_tok`` is the doc's offset in its bucket's concatenated token
    stream; ``pack_seq = start_tok // pack_tokens`` (the pack where the
    doc STARTS — straddling allowed); ``offset_in_pack = start_tok %
    pack_tokens``.  Global pack identity is the pair (bucket, pack_seq).
    """
    d = _with_tokens(docs, id_col, text_col, tokens_col).withColumn(
        "bucket", hash_bucket("doc_id", n_buckets, method=hash_method)
    )
    w = W.partitionBy("bucket").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, 0))
    d = d.withColumn("start_tok", (cum - F.col("n_tokens")).cast("long"))
    return d.select(
        "doc_id",
        "n_tokens",
        F.col("bucket").cast("long").alias("bucket"),
        "start_tok",
        # `div` = exact int64 division: the double-division form loses
        # exactness once a bucket's token stream passes 2^53
        # (code-review r5) — real at 100 TB with small n_buckets
        F.expr(f"start_tok div {int(pack_tokens)}").alias("pack_seq"),
        (F.col("start_tok") % F.lit(pack_tokens)).cast("long").alias("offset_in_pack"),
    )


_NEXTFIT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("pack_seq", T.LongType()),
        T.StructField("offset_in_pack", T.LongType()),
        T.StructField("oversize", T.BooleanType()),
    ]
)


def pack_sequences_nextfit(
    docs: DataFrame,
    pack_tokens: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """No-straddle greedy next-fit packing (see module docstring).

    Invariants (pinned by tests): within a pack, docs are contiguous in
    doc_id order and sum(n_tokens) ≤ pack_tokens unless the pack is a
    single flagged oversize doc; offset_in_pack is the running offset.
    """
    import pandas as pd

    d = _with_tokens(docs, id_col, text_col, tokens_col).withColumn(
        "bucket", hash_bucket("doc_id", n_buckets, method=hash_method)
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        toks = pdf["n_tokens"].to_numpy()
        n = len(pdf)
        pack = [0] * n
        off = [0] * n
        over = [False] * n
        cur, used = 0, 0
        for i in range(n):
            t = int(toks[i])
            if t > pack_tokens:
                # oversize: its own pack
                if used > 0:
                    cur += 1
                pack[i], off[i], over[i] = cur, 0, True
                cur += 1
                used = 0
                continue
            if used + t > pack_tokens:
                cur += 1
                used = 0
            pack[i], off[i] = cur, used
            used += t
        out = pdf[["doc_id", "n_tokens", "bucket"]].copy()
        out["pack_seq"] = pack
        out["offset_in_pack"] = off
        out["oversize"] = over
        return out.astype(
            {
                "doc_id": "int64",
                "n_tokens": "int64",
                "bucket": "int64",
                "pack_seq": "int64",
                "offset_in_pack": "int64",
            }
        )

    return d.groupBy("bucket").applyInPandas(fit, schema=_NEXTFIT_SCHEMA)
