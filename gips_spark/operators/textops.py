"""Text-analysis operators over a documents table (doc_id, text, ...).

Training-data pipeline components: language id, quality scoring, token
counting, fingerprinting — each one Arrow pass, JVM-side where a Column
expression suffices (token counts / ratios can also be expressed without
Python; both paths provided, the expression path is what oracle_sql
mirrors)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gips_spark.functions import udfs


def analyze_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ per-document analysis columns (lang_pred, quality parts, tokens,
    fingerprint). Hot counters are JVM expressions; lang/fingerprint are
    Arrow kernels."""
    t = F.col(text_col)
    ws_tokens = F.when(
        F.length(F.trim(t)) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(t), r"\s+")))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return docs.select(
        F.col(id_col),
        t.alias(text_col),
        F.length(t).alias("n_chars"),
        ws_tokens.alias("n_tokens_ws"),
        udfs.token_count_udf(t).alias("n_tokens"),
        n_punct.alias("n_punct"),
        (n_punct / F.greatest(F.length(t), F.lit(1))).alias("punct_ratio"),
        udfs.lang_id_udf(t).alias("lang_pred"),
        udfs.fingerprint_udf(t).alias("fingerprint"),
    )


def quality_filter(analyzed: DataFrame, min_tokens: int = 5, max_punct_ratio: float = 0.3) -> DataFrame:
    return analyzed.where(
        (F.col("n_tokens_ws") >= min_tokens) & (F.col("punct_ratio") <= max_punct_ratio)
    )


def language_histogram(analyzed: DataFrame) -> DataFrame:
    return (
        analyzed.groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens_ws").alias("n_tokens"))
        .orderBy(F.desc("n_docs"), F.asc("lang_pred"))
    )


QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("punct_ratio", T.DoubleType()),
        T.StructField("stop_ratio", T.DoubleType()),
        T.StructField("mean_tok_len", T.DoubleType()),
        T.StructField("quality", T.DoubleType()),
    ]
)


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The full quality-feature kernel (textx.quality_score: length /
    punctuation / en-stopword ratios + clipped [0,1] score) as one
    Arrow pass — the numeric-feature sibling of analyze_documents."""
    from typing import Iterator

    import pandas as pd

    from gips_spark.functions import textx

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in QUALITY_SCHEMA.fields]
        for pdf in it:
            q = textx.quality_score(pdf[text_col])
            q.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield q[cols]

    return docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col)).mapInPandas(
        kernel, schema=QUALITY_SCHEMA
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document top-k TF-IDF terms (whitespace tokens; smooth
    idf = ln((N+1)/(df+1)) + 1).  Shape at scale: token explode →
    (doc, tok) count (one shuffle) → doc-frequency rollup over the
    ALREADY-distinct (doc, tok) pairs (never re-reads raw tokens) →
    join on tok (vocab-sized side, broadcast when small) → per-doc
    top-k window.  All JVM; the only scalar is the corpus doc count."""
    from pyspark.sql import Window as W

    tok = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " +")).alias("tok")
    ).where(F.col("tok") != "")
    tf = tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    idf = F.log(
        (F.lit(float(n_docs) + 1.0)) / (F.col("df") + F.lit(1.0))
    ) + F.lit(1.0)
    scored = tf.join(dfreq, "tok").select(
        id_col, "tok", "tf", (F.col("tf") * idf).alias("score")
    )
    w = W.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("tok").asc())
    return scored.withColumn("trank", F.row_number().over(w)).where(
        F.col("trank") <= k
    )
