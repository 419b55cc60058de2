"""Coverage for the small public API helpers that no flagship path
routes through — they are user-facing conveniences, and this file is
what keeps them from silently rotting."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_txt_lines_df_matches_txt_export_format(spark):
    """The distributed TXT formatter emits the exact `digest key` lines
    the byte-parity TXT sink writes (exporters.write_txt)."""
    from hashio_spark.sources.exporters import txt_lines_df

    df = spark.createDataFrame(
        [("a.txt", "deadbeef"), ("b.txt", "cafe0001")], "path string, digest string"
    )
    lines = sorted(r["value"] for r in txt_lines_df(df, "path").collect())
    assert lines == ["cafe0001 b.txt", "deadbeef a.txt"]


def test_column_stats_one_row_per_group(spark):
    from hashio_spark.operators.stats import column_stats

    df = spark.createDataFrame(
        [(0, 1, "x"), (0, 3, None), (1, 5, "y")], "partition_id int, v int, s string"
    )
    rows = {r["partition_id"]: r.asDict() for r in column_stats(df, ["v", "s"]).collect()}
    assert set(rows) == {0, 1}
    assert rows[0]["v_nulls"] == 0 and rows[0]["s_nulls"] == 1
    assert rows[0]["v_min"] == 1 and rows[0]["v_max"] == 3


def test_all_constraint_violations_counts_match_datagen_oracle(spark):
    """The one-call union of every constraint class reproduces the exact
    planted-violation counts datagen promises (expected_violation_counts
    is itself the oracle under test here)."""
    from hashio_spark.datagen import (
        asset_catalog,
        documents_interleaved,
        expected_violation_counts,
    )
    from hashio_spark.operators.constraints import all_constraint_violations

    n = 600
    docs = documents_interleaved(spark, n_docs=n, n_assets=100, n_partitions=4)
    cat = asset_catalog(spark, 100)
    exp = expected_violation_counts(n)
    got = {
        r["rule"]: r["n"]
        for r in all_constraint_violations(docs, cat)
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # duplicate_keys emits ONE violation row per duplicated key; the
    # datagen oracle counts member ROWS (2 per planted pair)
    assert got.get("duplicate_doc_id", 0) == exp["duplicate_doc_rows"] // 2
    assert got.get("dangling_media_ref", 0) == exp["dangling_docs"]


def test_lang_scores_expr_scores_english_highest(spark):
    from hashio_spark.functions.text import lang_scores_expr

    df = spark.createDataFrame(
        [("the cat and the dog sat on the mat of the house",)], "text string"
    )
    scores = df.select(lang_scores_expr("text").alias("m")).first()["m"]
    assert scores["en"] == max(scores.values()) and scores["en"] > 0


def test_simhash64_q_matches_operator(spark):
    """The convenience wrapper is exactly dedupe.simhash64 over the
    documents table (key renamed)."""
    from hashio_spark.operators.dedupe import simhash64
    from hashio_spark.queries import simhash64_q

    via_q = {r["doc_id"]: r["simhash"] for r in simhash64_q(spark, SF).collect()}
    d = spark.read.parquet(f"{SF}/documents.parquet")
    via_op = {r["key"]: r["simhash"] for r in simhash64(d, "doc_id", "text").collect()}
    assert via_q == via_op and len(via_q) > 0
