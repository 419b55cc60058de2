"""Bucketed table layout: shuffle-free uniqueness and co-located joins.

BENCH.md's plan decomposition shows the global-uniqueness check is the
flagship's worst-scaling stage — it is the one full-table exchange on
``doc_id``.  Bucketing the document table by ``doc_id`` at WRITE time
moves that shuffle out of every subsequent run: a bucketed scan reports
``hashpartitioning(doc_id, n)`` as its output partitioning, Catalyst sees
the aggregation's required distribution already satisfied, and plans the
``groupBy(doc_id)`` — and any equi-join against a table bucketed the same
way — WITHOUT an Exchange.  At 10^12 rows that converts the uniqueness
pass from the dominant network cost to a map-only stage (the Iceberg
analog is a ``bucket(n, doc_id)`` partition transform; Spark's
``bucketBy`` is the jar-less equivalent used here).

The trade: bucketed tables must be written through the session catalog
(``saveAsTable``) — plain ``.parquet(path)`` reads lose the bucketing
metadata — and both join sides must agree on (column, n_buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed on ``bucket_col``.

    ``sort_cols`` additionally sorts within buckets (enables sort-merge
    joins without a per-query sort).  ``n_buckets`` should be sized so a
    bucket fits an executor's scan budget at the target scale — buckets
    are the unit of parallelism for the shuffle-free plans downstream.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def duplicate_keys_grouped(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """(key, dup_count>1) — identical plan to the uniqueness constraint's
    core; when ``docs`` is a bucketed-table scan on ``key_col``, Catalyst
    plans this with NO Exchange (assert via :func:`has_exchange`)."""
    return (
        docs.groupBy(F.col(key_col))
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def has_exchange(df: DataFrame) -> bool:
    """True iff the physical plan contains a shuffle Exchange.  Used by
    tests to prove bucketed plans are exchange-free; BroadcastExchange
    (not a shuffle) is ignored."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        line.strip().lstrip("+-* ").startswith("Exchange")
        for line in plan.splitlines()
    )


def bucketed_self_check(spark: SparkSession, table: str, key_col: str = "doc_id") -> DataFrame:
    """Uniqueness over a bucketed table: the scan's hashpartitioning
    satisfies the aggregation, so this is a map-only plan."""
    return duplicate_keys_grouped(spark.table(table), key_col)
