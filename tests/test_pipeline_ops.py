"""Round-4 training-pipeline ops: decontamination, repetition stats,
deterministic stratified sampling."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "pack my box with five dozen liquor jugs", "en"),
        (2, "the quick brown fox sleeps all day long", "en"),   # shares grams with 0
        (3, "der schnelle braune fuchs springt hoch", "de"),
        (4, "one two", "en"),                                    # < k tokens
        (5, "spam spam spam spam spam spam spam", "en"),         # pure repetition
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))


def test_contamination_hashed_matches_string_join(corpus):
    from hashio_spark.operators.decontaminate import contamination

    bench = corpus.filter(F.col("doc_id") == 0)
    train = corpus.filter(F.col("doc_id") != 0)
    want = {(r["doc_id"], r["n_shared"])
            for r in contamination(train, bench, hashed=False).collect()}
    got = {(r["doc_id"], r["n_shared"])
           for r in contamination(train, bench, hashed=True).collect()}
    assert got == want
    # doc 2 shares exactly 'the quick brown' + 'quick brown fox'
    assert (2, 2) in got
    # the de doc and the short doc share nothing
    assert {d for d, _ in got} == {2}


def test_repetition_short_and_degenerate_docs(corpus):
    from hashio_spark.functions.text import gram_repetition_struct

    toked = corpus.select("doc_id", F.split("text", r"\s+").alias("_toks"))
    out = {
        r["doc_id"]: (r["r"]["n_grams"], r["r"]["n_distinct"])
        for r in toked.select("doc_id", gram_repetition_struct("_toks", 3).alias("r")).collect()
    }
    assert out[4] == (0, 0)          # <k tokens: no grams, no crash
    assert out[5] == (5, 1)          # 'spam spam spam' x5 grams, 1 distinct
    assert out[0][0] == out[0][1] == 7  # all grams unique


def test_sample_stratified_monotone_and_layout_independent(corpus):
    from hashio_spark.operators.sampling import sample_stratified

    lo = {r["doc_id"] for r in sample_stratified(corpus, "doc_id", "lang", {"en": 0.3}, 0.1).collect()}
    hi = {r["doc_id"] for r in sample_stratified(corpus, "doc_id", "lang", {"en": 0.9}, 0.1).collect()}
    assert lo <= hi  # raising a rate keeps a superset
    # partition layout must not change the sample (df.sample() would)
    shuffled = corpus.repartition(7, "lang")
    again = {r["doc_id"] for r in sample_stratified(shuffled, "doc_id", "lang", {"en": 0.9}, 0.1).collect()}
    assert again == hi
    # md5 and xxhash64 tiers both honor rate 0 / rate 1 exactly
    none = sample_stratified(corpus, "doc_id", "lang", {}, 0.0, method="md5").count()
    everything = sample_stratified(corpus, "doc_id", "lang", {}, 1.0, method="md5").count()
    assert none == 0 and everything == corpus.count()


def test_sample_stratified_rate_accuracy(spark):
    from hashio_spark.operators.sampling import sample_stratified

    big = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = sample_stratified(big, "doc_id", "lang", {"en": 0.5, "de": 0.1})
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(by_lang["en"] / 10000 - 0.5) < 0.03
    assert abs(by_lang["de"] / 10000 - 0.1) < 0.02


def test_connected_components_chain_and_cliques(spark):
    """Label propagation must close transitive chains (diameter > 1) and
    keep disjoint cliques apart; duplicate_clusters keeps exactly one
    representative per component."""
    import pandas as pd

    from hashio_spark.operators.graph import connected_components, duplicate_clusters

    edges = spark.createDataFrame(pd.DataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # chain: component 1
         (10, 11), (11, 12), (10, 12),        # triangle: component 10
         (20, 21)],                           # pair: component 20
        columns=["src", "dst"]))
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                  10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    clusters = duplicate_clusters(edges, "src", "dst").collect()
    kept = sorted(r["key"] for r in clusters if r["keep"])
    assert kept == [1, 10, 20]
    assert sum(not r["keep"] for r in clusters) == 7
