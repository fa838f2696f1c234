"""repetition_stats + decontaminate (textops) — hand-computed oracles
and plan gates.  Reference semantics: Gopher §A1.1 repetition filters
(Rae et al. 2021) and GPT-3-style n-gram decontamination — both public.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gips_spark.operators import textops

DOCS = [
    (1, "a b c a b c a b"),                    # 2-gram/5-gram repeats, 1 line
    (2, "x y\nx y\nz z z\nx y"),               # duplicate lines
    (3, ""),                                   # empty doc must survive with zeros
    (4, "one two three four five six seven"),  # no repeats
    (5, "p q r s t p q r s t p q r s t u"),    # heavy 5-gram repeats
]


@pytest.fixture(scope="module")
def rep(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = textops.repetition_stats(df).orderBy("doc_id").collect()
    return {r["doc_id"]: r for r in out}


def test_word_ngrams_zip_construction_reference(spark):
    """r6 (zipped-shifted-slices rewrite): word_ngrams must equal a
    plain-Python reference on every edge shape — short docs, exactly-n
    docs, tab/newline whitespace (ws_tokens, no phantom empties), NULL,
    and n=1."""
    rows = [
        (1, "a b c d e"),
        (2, "a b"),            # exactly n for n=2
        (3, "a"),              # shorter than any n>1
        (4, ""),               # empty
        (5, None),             # NULL ≡ empty
        (6, "\t a\nb  c \t"),  # mixed whitespace, leading tab
        (7, "x " * 50 + "y"),  # longer doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (1, 2, 3, 5):
        got = {
            r["doc_id"]: r["g"]
            for r in df.select(
                "doc_id", textops.word_ngrams(F.col("text"), n).alias("g")
            ).collect()
        }
        for doc_id, text in rows:
            toks = (text or "").split()
            want = [
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ] if len(toks) >= n else []
            assert got[doc_id] == want, (doc_id, n, got[doc_id], want)


def test_repetition_hand_computed(rep):
    r1 = rep[1]  # "a b c a b c a b", 15 chars
    assert r1["n_lines"] == 1 and r1["dup_line_frac"] == 0.0
    # "a b" x3, len 3 -> 9/15
    assert r1["top2_char_frac"] == pytest.approx(0.6)
    # g3 all tie at cnt 2 -> gram-ASC picks "a b c": 2*5/15
    assert r1["top3_char_frac"] == pytest.approx(round(10 / 15, 9))
    # dup 5-grams: "a b c a b" x2 = 18 chars > 15 -> clipped
    assert r1["dup5_char_frac"] == 1.0

    r2 = rep[2]  # 4 lines, "x y" x3 duplicated, 17 chars
    assert r2["n_lines"] == 4
    assert r2["dup_line_frac"] == pytest.approx(0.5)  # (4-2)/4
    assert r2["dup_line_char_frac"] == pytest.approx(round(9 / 17, 9))

    r3 = rep[3]  # empty doc: all zeros, not dropped
    assert r3["n_chars"] == 0 and r3["n_lines"] == 0
    assert r3["dup5_char_frac"] == 0.0

    r4 = rep[4]
    assert r4["dup_line_frac"] == 0.0 and r4["dup5_char_frac"] == 0.0

    r5 = rep[5]
    assert r5["dup5_char_frac"] == 1.0  # 5 dup 5-grams x >=2 occurrences


def test_repetition_numpy_cross_check(spark):
    """Independent recomputation (python dict counting) on pseudo-random
    small-vocab docs — every column, every doc."""
    rng = np.random.default_rng(7)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    docs = []
    for i in range(40):
        n = int(rng.integers(0, 30))
        words = [vocab[int(k)] for k in rng.integers(0, len(vocab), n)]
        # sprinkle newlines to create multi-line docs
        text = " ".join(words)
        if n > 6:
            text = text.replace(" dd ", "\n", 3)
        docs.append((i, text))
    got = {
        r["doc_id"]: r
        for r in textops.repetition_stats(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }

    from collections import Counter

    for i, text in docs:
        r = got[i]
        nchars = len(text)
        assert r["n_chars"] == nchars
        lines = [ln for ln in text.split("\n") if ln.strip() != ""]
        cl = Counter(lines)
        assert r["n_lines"] == len(lines)
        want_dlf = (len(lines) - len(cl)) / len(lines) if lines else 0.0
        assert r["dup_line_frac"] == pytest.approx(round(want_dlf, 9), abs=1e-9)
        dup_chars = sum(c * len(g) for g, c in cl.items() if c >= 2)
        want_dlcf = min(dup_chars / max(nchars, 1), 1.0) if lines else 0.0
        assert r["dup_line_char_frac"] == pytest.approx(round(want_dlcf, 9), abs=1e-9)
        toks = text.split() if text.strip() else []
        for n, col, mode in [
            (2, "top2_char_frac", "top"),
            (3, "top3_char_frac", "top"),
            (5, "dup5_char_frac", "dup"),
        ]:
            grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
            cg = Counter(grams)
            if not cg:
                assert r[col] == 0.0
                continue
            if mode == "top":
                top = min(cg.items(), key=lambda kv: (-kv[1], kv[0]))
                want = min(top[1] * len(top[0]) / max(nchars, 1), 1.0)
            else:
                want = min(
                    sum(c * len(g) for g, c in cg.items() if c >= 2)
                    / max(nchars, 1),
                    1.0,
                )
            assert r[col] == pytest.approx(round(want, 9), abs=1e-9), (i, col)


def test_repetition_is_pure_jvm(spark):
    """Scale gate: the plan contains no Python/Arrow stage — split /
    transform / explode / aggregates are all JVM-side."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = textops.repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_decontaminate_hash_equals_gram_and_hand_case(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "p q r s t p q r s"), (101, "nothing matches here at all")],
        "doc_id long, text string",
    )
    a = textops.decontaminate(docs, bench, n=5, join_on="hash").collect()
    b = textops.decontaminate(docs, bench, n=5, join_on="gram").collect()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(a) == key(b)
    assert len(a) == 1 and a[0]["doc_id"] == 5
    # bench 5-grams: pqrst, qrstp, rstpq, stpqr, tpqrs (5 of doc 5's 6)
    assert a[0]["n_hit_grams"] == 5 and a[0]["n_grams"] == 6
    assert a[0]["hit_frac"] == pytest.approx(round(5 / 6, 9))


def test_decontaminate_broadcasts_benchmark(spark):
    """Scale gate: the benchmark gram set must arrive via
    BroadcastExchange — the corpus side never shuffles for the join."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame([(0, "p q r s t u v w")], "doc_id long, text string")
    plan = (
        textops.decontaminate(docs, bench, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_entropy_stats_numpy_cross_check(spark):
    """entropy_stats == scipy-free numpy/Counter recomputation on
    adversarial docs (empty, whitespace-only, single-symbol, mixed)."""
    from collections import Counter

    docs = [
        (1, "aab"),
        (2, ""),
        (3, "x y x y z"),
        (4, "   "),
        (5, "zzzzzz"),
        (6, "the quick brown fox the quick"),
        (7, "\n\n"),
        (8, "\ta b"),
    ]
    out = {
        r["doc_id"]: r
        for r in textops.entropy_stats(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }

    def H(xs):
        if not xs:
            return 0.0
        c, n = Counter(xs), len(xs)
        return -sum((v / n) * np.log(v / n) for v in c.values())

    for i, t in docs:
        cs = list(t)
        tk = t.split() if t.strip() else []
        r = out[i]
        assert r["n_chars"] == len(cs) and r["n_tokens"] == len(tk)
        assert r["char_distinct"] == len(set(cs))
        assert r["token_distinct"] == len(set(tk))
        assert r["char_entropy"] == pytest.approx(round(H(cs), 6) + 0.0, abs=2e-6)
        assert r["token_entropy"] == pytest.approx(round(H(tk), 6) + 0.0, abs=2e-6)
        want_ttr = len(set(tk)) / len(tk) if tk else 0.0
        assert r["token_ttr"] == pytest.approx(round(want_ttr, 6), abs=1e-9)
        # sign-normalized: never -0.0 on the wire
        assert str(r["char_entropy"])[0] != "-" or r["char_entropy"] != 0.0


def test_entropy_stats_is_zero_shuffle_pure_jvm(spark):
    """Scale gate: a narrow projection — NO Exchange, no Python stage."""
    docs = spark.createDataFrame([(1, "a b"), (2, "c")], "doc_id long, text string")
    plan = textops.entropy_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_entropy_bounds_property(spark):
    """0 <= H <= ln(distinct); TTR in [0,1]; uniform text maximizes."""
    import math

    docs = [(1, "a b c d"), (2, "a a a a"), (3, "q w e r t y u i")]
    for r in textops.entropy_stats(
        spark.createDataFrame(docs, "doc_id long, text string")
    ).collect():
        # +5e-7: round-6 may push H up by half a rounding step
        assert 0.0 <= r["token_entropy"] <= math.log(max(r["token_distinct"], 1)) + 5e-7
        assert 0.0 <= r["char_entropy"] <= math.log(max(r["char_distinct"], 1)) + 5e-7
        assert 0.0 <= r["token_ttr"] <= 1.0
    got = {
        r["doc_id"]: r
        for r in textops.entropy_stats(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    assert got[1]["token_entropy"] == pytest.approx(np.log(4), abs=2e-6)
    assert got[2]["token_entropy"] == 0.0


def test_repetition_local_strategy_bit_identical(spark):
    """strategy='local' (zero-shuffle HOF path) must reproduce the
    explode strategy bit-for-bit — integer dup arithmetic makes fold
    order immaterial, and the (cnt DESC, gram ASC) top tie-break is the
    same."""
    rng = np.random.default_rng(17)
    vocab = ["aa", "b", "ccc", "dd", "e", "ff f"]
    docs = [(99990, ""), (99991, "  \n \n "), (99992, None), (99993, "\tx y x y")]
    for i in range(150):
        n = int(rng.integers(0, 35))
        words = [vocab[int(k)] for k in rng.integers(0, len(vocab), n)]
        text = " ".join(words)
        if n > 6:
            text = text.replace(" dd ", "\n", 3)
        docs.append((i, text))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(tuple(r) for r in textops.repetition_stats(df).collect())
    b = sorted(
        tuple(r) for r in textops.repetition_stats(df, strategy="local").collect()
    )
    assert a == b
    plan = (
        textops.repetition_stats(df, strategy="local")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
    with pytest.raises(ValueError):
        textops.repetition_stats(df, strategy="bogus")
