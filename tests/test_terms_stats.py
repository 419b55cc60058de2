"""TF-IDF top terms and exact per-group correlation vs pure-Python models."""

import math

import pytest
from pyspark.sql import functions as F

from hashio_spark.operators.stats import exact_group_corr
from hashio_spark.operators.terms import tfidf_top_terms


def test_tfidf_top_terms_hand_case(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.rank): (r.term, r.tfidf)
        for r in tfidf_top_terms(docs, top_k=2).collect()
    }
    ln = math.log
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert out[(1, 1)] == ("apple", round(2 * ln(3.0), 6))
    assert out[(1, 2)] == ("banana", round(ln(1.5), 6))
    # doc 3: durian (tf=1, df=1, ln3) beats cherry (tf=3, df=2, 3*ln1.5=1.216)
    assert out[(3, 2)] == ("durian", round(ln(3.0), 6))
    assert out[(3, 1)] == ("cherry", round(3 * ln(1.5), 6))


def test_tfidf_rank_tiebreak_is_term_asc(spark):
    docs = spark.createDataFrame(
        [(1, "zeta alpha"), (2, "other words")], "doc_id long, text string"
    )
    rows = {
        r.rank: r.term
        for r in tfidf_top_terms(docs, top_k=2).filter(F.col("doc_id") == 1).collect()
    }
    # equal tf and df -> equal weight -> alphabetical order decides
    assert rows == {1: "alpha", 2: "zeta"}


@pytest.mark.parametrize("n_parts", [1, 7])
def test_exact_group_corr_matches_model_and_partitioning(spark, n_parts):
    import random

    rng = random.Random(42)
    rows = [
        ("g%d" % (i % 3), round(rng.uniform(-900, 90000), 2), round(rng.uniform(-900, 9000), 2))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double").repartition(n_parts)
    got = {r.g: (r.n, r.corr) for r in exact_group_corr(df, "x", "y", "g").collect()}

    def model(pts):
        xs = [round(x * 100) for _, x, _ in pts]
        ys = [round(y * 100) for _, _, y in pts]
        n = len(xs)
        sx, sy = float(sum(xs)), float(sum(ys))
        sxy = float(sum(a * b for a, b in zip(xs, ys)))
        sx2 = float(sum(a * a for a in xs))
        sy2 = float(sum(b * b for b in ys))
        return round(
            (n * sxy - sx * sy) / math.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6
        )

    for g in ("g0", "g1", "g2"):
        pts = [r for r in rows if r[0] == g]
        assert got[g][0] == len(pts)
        # exact integer sums -> the double formula is bit-identical to the
        # python model regardless of Spark partitioning
        assert got[g][1] == model(pts), g


def test_vocab_coverage_hand_case(spark):
    from hashio_spark.operators.terms import vocab_coverage

    # corpus: 'a'x5, 'b'x3, 'c'x1, 'd'x1  (total 10 tokens, 4 types)
    docs = spark.createDataFrame(
        [(1, "a a a b b"), (2, "a a b c d")], "doc_id long, text string"
    )
    got = {r.k: r for r in vocab_coverage(docs, "text", ks=(1, 2, 10)).collect()}
    assert got[1].covered_tokens == 5 and got[1].coverage == 0.5
    assert got[2].covered_tokens == 8 and got[2].coverage == 0.8
    # k beyond the vocabulary covers everything
    assert got[10].covered_tokens == 10 and got[10].coverage == 1.0
    assert all(r.total_tokens == 10 and r.vocab_size == 4 for r in got.values())


def test_vocab_coverage_tie_break_is_lexical(spark):
    from hashio_spark.operators.terms import vocab_coverage

    # 'x' and 'y' tie at 2; k=1 must deterministically pick 'x' (lexical)
    docs = spark.createDataFrame([(1, "x y x y")], "doc_id long, text string")
    row = vocab_coverage(docs, "text", ks=(1,)).collect()[0]
    assert row.covered_tokens == 2 and row.coverage == 0.5
