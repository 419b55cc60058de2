"""Bucketed-layout shuffle elimination: the uniqueness aggregation and a
co-bucketed join must plan WITHOUT a shuffle Exchange when the table is
bucketed on the key (BENCH.md: the uniqueness exchange is the flagship's
worst-scaling stage; bucketing removes it at write time)."""

import pytest
from pyspark.sql import functions as F

from hashio_spark.sources.bucketed import (
    bucketed_self_check,
    duplicate_keys_grouped,
    has_exchange,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_docs(spark, docs):
    write_bucketed(docs.select("doc_id", "partition_id"), "t_docs_bucketed", "doc_id", n_buckets=8)
    yield "t_docs_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_docs_bucketed")


def test_unbucketed_uniqueness_shuffles(docs):
    assert has_exchange(duplicate_keys_grouped(docs, "doc_id"))


def test_bucketed_uniqueness_is_shuffle_free(spark, docs, bucketed_docs):
    q = bucketed_self_check(spark, bucketed_docs, "doc_id")
    assert not has_exchange(q)
    # same answer as the shuffled plan over the original docs (datagen
    # deliberately plants duplicate doc_ids — the counts must agree)
    expected = duplicate_keys_grouped(docs, "doc_id").count()
    assert expected > 0
    assert q.count() == expected


def test_bucketed_join_is_shuffle_free(spark, docs, bucketed_docs):
    write_bucketed(
        docs.select("doc_id", F.col("partition_id").alias("p2")),
        "t_docs_bucketed2", "doc_id", n_buckets=8,
    )
    try:
        a = spark.table(bucketed_docs)
        b = spark.table("t_docs_bucketed2")
        # co-bucketed equi-join: sort-merge without exchanges (disable
        # broadcast so the join strategy is actually exercised)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = a.join(b, "doc_id")
            assert not has_exchange(j)
            # both sides carry the same doc_id multiset (incl. planted
            # dups) -> join cardinality is sum over keys of cnt^2
            expected = (
                docs.groupBy("doc_id").count()
                .agg(F.sum(F.col("count") * F.col("count"))).first()[0]
            )
            assert j.count() == expected
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_bucketed2")


def test_bucketed_values_roundtrip(spark, docs, bucketed_docs):
    got = spark.table(bucketed_docs).count()
    assert got == docs.count()
