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


def ws_tokens(text_col):
    """Whitespace tokens of a text Column, with NO phantom empties:
    ``filter(split(t, '\\s+'), x -> x != '')`` — unlike split(trim(t)),
    this also drops the empty string a LEADING tab/newline leaves
    behind (Spark `trim` strips only ASCII space, so '\\t a' kept its
    tab and split yielded a phantom '' token — code-review r5, verified
    live).  NULL text → empty array.  DuckDB mirror:
    ``list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')``."""
    return F.filter(
        F.split(F.coalesce(text_col, F.lit("")), r"\s+"), lambda x: x != ""
    )


def word_ngrams(text_col, n: int):
    """array<string> of word `n`-grams of a text Column (ws_tokens,
    single-space joined).  Pure JVM, no Python; mirrored verbatim by
    the DuckDB oracles via list_transform + list_slice.  Empty/short/
    NULL texts yield an empty array.

    r6 construction (guide §1.2 "per-task work", measured ~1.9× on the
    1M-doc bench, output pinned bit-identical): n-grams are built by
    zipping n SHIFTED slices of the token array — n `slice` calls per
    document — instead of `transform(sequence(...), i -> concat_ws(' ',
    slice(toks, i, n)))`, which allocated a fresh sub-array per GRAM
    inside an interpreted higher-order function (HOFs never enter
    whole-stage codegen, so per-element work is the multiplier that
    matters)."""
    toks = ws_tokens(text_col)
    sz = F.size(toks)
    m = sz - F.lit(n - 1)  # gram count when sz >= n
    out = F.slice(toks, 1, m)
    for k in range(2, n + 1):
        out = F.zip_with(
            out, F.slice(toks, k, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    # guard < n tokens: m <= 0 would make slice error under ANSI mode —
    # the CaseWhen keeps the otherwise branch unevaluated for short docs
    return F.when(sz < n, F.array().cast("array<string>")).otherwise(out)


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3),
    dup_ns: tuple = (5,),
    strategy: str = "explode",
) -> DataFrame:
    """Within-document repetition signals (the Gopher §A1.1 repetition
    filter family, Rae et al. 2021 — public): per document,

    * ``n_lines``, ``dup_line_frac`` — fraction of line OCCURRENCES that
      are repeats of an earlier-seen line: (n_lines - n_distinct)/n_lines;
    * ``dup_line_char_frac`` — chars across ALL occurrences of duplicated
      lines / total chars;
    * ``top{n}_char_frac`` (n in top_ns) — chars covered by the most
      frequent word n-gram (count × gram length, ties broken gram-ASC)
      / total chars, clipped to 1 (occurrences may overlap);
    * ``dup{n}_char_frac`` (n in dup_ns) — chars across all occurrences
      of word n-grams seen ≥2× / total chars, clipped to 1.

    Two strategies, BIT-IDENTICAL output (all duplicate-count arithmetic
    is integer, so accumulation order cannot matter; pinned equal by
    pytest):

    * ``strategy='explode'`` (default) — ONE tagged explode →
      partial-count shuffle on (doc, kind, gram); the gram in the key
      spreads giant documents across partitions.  O(units) work; the
      safe asymptotic choice for long documents (10^5+ tokens).
    * ``strategy='local'`` — ZERO-shuffle narrow projection: per-doc
      counts via higher-order array functions (filter-count against the
      doc's own gram array, the entropy_stats pattern).  O(distinct ×
      units) per doc — wins decisively on short/mid web documents
      (measured ~3.6× on 24-token docs with clean canary flanks,
      BENCH/textops_bench.json) and loses only when distinct×units per
      doc outgrows the cost of shuffling the units.

    Everything JVM-side, zero Python, in both.  Lines = split(text,
    '\\n').
    """
    if strategy == "local":
        return _repetition_stats_local(docs, id_col, text_col, top_ns, dup_ns)
    if strategy != "explode":
        raise ValueError("strategy must be 'explode' or 'local'")
    # NULL text ≡ empty text in both strategies (code-review r5: the
    # local path's least(NULL, 1.0) used to score null docs 1.0)
    t = F.coalesce(F.col(text_col), F.lit(""))
    units = [
        F.transform(
            F.filter(F.split(t, "\n"), lambda x: F.trim(x) != ""),
            lambda x: F.struct(F.lit("line").alias("kind"), x.alias("gram")),
        )
    ]
    def _tagger(kind: str):
        # single-arg closure — a two-arg lambda would make pyspark's
        # transform() pass the ELEMENT INDEX as the second argument
        return lambda x: F.struct(F.lit(kind).alias("kind"), x.alias("gram"))

    for n in sorted(set(top_ns) | set(dup_ns)):
        units.append(F.transform(word_ngrams(t, n), _tagger(f"g{n}")))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).alias("n_chars"),
        F.explode(F.concat(*units)).alias("u"),
    ).select("doc_id", "n_chars", "u.kind", "u.gram")
    counted = exploded.groupBy("doc_id", "n_chars", "kind", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_kind = counted.groupBy("doc_id", "n_chars", "kind").agg(
        F.sum("cnt").alias("n_units"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram")).otherwise(0)
        ).alias("dup_chars"),
        # most frequent gram, ties broken gram-ASC: min_by over the
        # orderable struct (-cnt, gram); value = its char coverage
        F.expr("min_by(cnt * length(gram), struct(-cnt, gram))").alias("top_cov"),
    )
    safe_chars = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    agg_exprs = [
        F.coalesce(
            F.max(F.when(F.col("kind") == "line", F.col("n_units"))), F.lit(0)
        ).alias("n_lines"),
        F.round(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("kind") == "line",
                        (F.col("n_units") - F.col("n_distinct"))
                        / F.col("n_units").cast("double"),
                    )
                ),
                F.lit(0.0),
            ),
            9,
        ).alias("dup_line_frac"),
        F.round(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("kind") == "line",
                        F.least(F.col("dup_chars") / safe_chars, F.lit(1.0)),
                    )
                ),
                F.lit(0.0),
            ),
            9,
        ).alias("dup_line_char_frac"),
    ]
    for n in sorted(set(top_ns)):
        agg_exprs.append(
            F.round(
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("kind") == f"g{n}",
                            F.least(F.col("top_cov") / safe_chars, F.lit(1.0)),
                        )
                    ),
                    F.lit(0.0),
                ),
                9,
            ).alias(f"top{n}_char_frac")
        )
    for n in sorted(set(dup_ns)):
        agg_exprs.append(
            F.round(
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("kind") == f"g{n}",
                            F.least(F.col("dup_chars") / safe_chars, F.lit(1.0)),
                        )
                    ),
                    F.lit(0.0),
                ),
                9,
            ).alias(f"dup{n}_char_frac")
        )
    stats = per_kind.groupBy("doc_id", "n_chars").agg(*agg_exprs)
    # docs with no units at all (empty/whitespace text) vanish in the
    # explode — restore them with all-zero stats off the doc spine
    spine = docs.select(F.col(id_col).alias("doc_id"), F.length(t).alias("n_chars"))
    stat_cols = [c for c in stats.columns if c not in ("doc_id", "n_chars")]
    return spine.join(stats, ["doc_id", "n_chars"], "left").select(
        "doc_id",
        "n_chars",
        *[
            F.coalesce(F.col(c), F.lit(0) if c == "n_lines" else F.lit(0.0)).alias(c)
            for c in stat_cols
        ],
    )


def _repetition_stats_local(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    top_ns: tuple,
    dup_ns: tuple,
) -> DataFrame:
    """Zero-shuffle strategy for repetition_stats (see its docstring).

    One O(distinct × units) pass per kind builds a (gram, cnt) struct
    array; every statistic is then an O(distinct) fold over it
    (code-review r5: the first cut recomputed the filter-count 4×).
    dup_chars folds cnt·len for cnt ≥ 2; the top gram is array_min over
    the grams achieving the max count (same (cnt DESC, gram ASC)
    tie-break as the explode strategy's min_by).  All integer
    arithmetic → fold order is immaterial."""
    t = F.coalesce(F.col(text_col), F.lit(""))  # NULL ≡ empty, both paths
    arrays = {"line": F.filter(F.split(t, "\n"), lambda x: F.trim(x) != "")}
    for n in sorted(set(top_ns) | set(dup_ns)):
        arrays[f"g{n}"] = word_ngrams(t, n)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).alias("n_chars"),
        *[a.alias(f"_a_{k}") for k, a in arrays.items()],
    )
    # the single expensive pass: (gram, cnt) pairs per kind
    d1 = d.select(
        "doc_id",
        "n_chars",
        *[F.col(f"_a_{k}").alias(f"_a_{k}") for k in arrays],
        *[
            F.expr(
                f"transform(array_distinct(_a_{k}), g -> named_struct("
                f"'g', g, 'c', size(filter(_a_{k}, x -> x = g))))"
            ).alias(f"_c_{k}")
            for k in arrays
        ],
    )
    stat_cols = []
    for k in arrays:
        C = f"_c_{k}"
        stat_cols.append(F.size(f"_a_{k}").cast("long").alias(f"_nu_{k}"))
        stat_cols.append(F.size(C).cast("long").alias(f"_nd_{k}"))
        stat_cols.append(
            F.expr(
                f"aggregate({C}, cast(0 as bigint), (acc, s) -> "
                f"acc + (case when s.c >= 2 "
                f"then cast(s.c as bigint) * length(s.g) else cast(0 as bigint) end))"
            ).alias(f"_dup_{k}")
        )
        if k != "line":
            stat_cols.append(
                F.expr(f"aggregate({C}, 0, (acc, s) -> greatest(acc, s.c))").alias(
                    f"_mc_{k}"
                )
            )
    d2 = d1.select("doc_id", "n_chars", *[f"_c_{k}" for k in arrays], *stat_cols)
    # top coverage: O(distinct) scan of the pair array against max count
    top_cols = [
        F.expr(
            f"cast(_mc_{k} as bigint) * length(array_min("
            f"transform(filter(_c_{k}, s -> s.c = _mc_{k}), s -> s.g)))"
        ).alias(f"_top_{k}")
        for k in arrays
        if k != "line"
    ]
    d3 = d2.select("*", *top_cols)
    safe = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    out = [
        F.col("_nu_line").alias("n_lines"),
        F.round(
            F.when(F.col("_nu_line") == 0, F.lit(0.0)).otherwise(
                (F.col("_nu_line") - F.col("_nd_line"))
                / F.col("_nu_line").cast("double")
            ),
            9,
        ).alias("dup_line_frac"),
        F.round(
            F.least(F.col("_dup_line") / safe, F.lit(1.0)), 9
        ).alias("dup_line_char_frac"),
    ]
    for n in sorted(set(top_ns)):
        out.append(
            F.round(
                F.when(F.col(f"_nu_g{n}") == 0, F.lit(0.0)).otherwise(
                    F.least(F.col(f"_top_g{n}") / safe, F.lit(1.0))
                ),
                9,
            ).alias(f"top{n}_char_frac")
        )
    for n in sorted(set(dup_ns)):
        out.append(
            F.round(F.least(F.col(f"_dup_g{n}") / safe, F.lit(1.0)), 9).alias(
                f"dup{n}_char_frac"
            )
        )
    return d3.select("doc_id", "n_chars", *out)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    join_on: str = "hash",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    `n`-gram with a benchmark/eval table (the GPT-3-style 13-gram /
    training-data overlap check — public; n defaults to 8).

    Returns (doc_id, n_hit_grams, n_grams, hit_frac) for contaminated
    documents only: n_hit_grams = DISTINCT doc n-grams present in the
    benchmark, n_grams = distinct n-grams in the doc, hit_frac their
    ratio.

    Shape at 100 TB: per-doc ``array_distinct`` BEFORE the explode (the
    corpus side never carries repeat grams into the shuffle), benchmark
    grams deduped then **broadcast** — the corpus never shuffles; the
    only wide op is the final doc_id partial-count agg.  join_on='hash'
    (default) joins on xxhash64(gram) — 8-byte keys instead of strings
    on the wire; 'gram' joins raw strings (the oracle path — pinned
    equal to the hash path by pytest; a collision needs ~2^32 distinct
    benchmark grams by the birthday bound).
    """
    if join_on not in ("hash", "gram"):
        raise ValueError("join_on must be 'hash' or 'gram'")
    dg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("grams"),
    )
    if join_on == "hash":
        # r6 (guide §2.3 "shuffle keys, not payloads", applied to the
        # Generate): hash INSIDE the array and explode int64s — the
        # explode then materializes (long, int, long) rows instead of
        # ~60-char gram strings that were hashed-and-dropped one
        # operator later.  Measured 15.0s → 8.1s on the 1M-doc side,
        # identical (doc_id, n_grams, k) multiset.
        doc_side = dg.select(
            "doc_id",
            F.size("grams").alias("n_grams"),
            F.explode(
                F.transform(F.col("grams"), lambda g: F.xxhash64(g))
            ).alias("k"),
        )
        bench_side = (
            benchmark.select(
                F.explode(
                    F.transform(
                        F.array_distinct(word_ngrams(F.col(bench_text_col), n)),
                        lambda g: F.xxhash64(g),
                    )
                ).alias("k")
            )
            .distinct()
        )
    else:
        doc_side = dg.select(
            "doc_id",
            F.size("grams").alias("n_grams"),
            F.explode("grams").alias("k"),
        )
        bench_side = (
            benchmark.select(
                F.explode(
                    F.array_distinct(word_ngrams(F.col(bench_text_col), n))
                ).alias("k")
            )
            .distinct()
        )
    hits = doc_side.join(F.broadcast(bench_side), "k").groupBy(
        "doc_id", "n_grams"
    ).agg(F.count(F.lit(1)).alias("n_hit_grams"))
    return hits.select(
        "doc_id",
        "n_hit_grams",
        "n_grams",
        F.round(
            F.col("n_hit_grams") / F.col("n_grams").cast("double"), 9
        ).alias("hit_frac"),
    )


def entropy_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document diversity/entropy quality signals (the entropy /
    compression-ratio filter family used in corpus curation — public):
    character- and token-unigram Shannon entropy (nats), distinct
    counts, and the type-token ratio.

    Shape at 100 TB: a ZERO-SHUFFLE narrow projection — entropies are
    computed per row with higher-order array functions (aggregate over
    array_distinct, filter-count against the full array), all JVM-side.
    Per-row cost is O(distinct_symbols × len): bounded ~100×len for
    real text (alphabet-sized char set, Zipfian token set is the worst
    case — for adversarial million-distinct-token docs, prefer an
    explode + (doc, token) count variant, same algebra as
    repetition_stats).  Empty docs yield zero entropies, not NaN."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    # split('', '') yields [''] — guard empties so counts come out 0;
    # tokens via ws_tokens (drops the phantom '' a leading tab/newline
    # leaves behind — code-review r5)
    prep = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(
            F.length(t) == 0, F.array().cast("array<string>")
        ).otherwise(F.split(t, "")).alias("_cs"),
        ws_tokens(t).alias("_tk"),
    )

    def h(arr: str) -> str:
        p = f"(size(filter({arr}, x -> x = c)) / cast(size({arr}) as double))"
        return (
            f"aggregate(array_distinct({arr}), cast(0.0 as double), "
            f"(acc, c) -> acc - {p} * ln({p}))"
        )

    return prep.select(
        "doc_id",
        F.size("_cs").cast("long").alias("n_chars"),
        F.size("_tk").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("_cs")).cast("long").alias("char_distinct"),
        F.size(F.array_distinct("_tk")).cast("long").alias("token_distinct"),
        # + 0.0 normalizes IEEE -0.0 (single-symbol docs: -1·ln(1)) so
        # byte-level value hashes can't split on the zero sign
        (F.round(F.expr(h("_cs")), 6) + F.lit(0.0)).alias("char_entropy"),
        (F.round(F.expr(h("_tk")), 6) + F.lit(0.0)).alias("token_entropy"),
        F.round(
            F.when(F.size("_tk") == 0, F.lit(0.0)).otherwise(
                F.size(F.array_distinct("_tk"))
                / F.size("_tk").cast("double")
            ),
            6,
        ).alias("token_ttr"),
    )
