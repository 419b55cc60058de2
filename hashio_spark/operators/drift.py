"""Distribution-drift checks: histogram aggregation + PSI / KS statistics.

The reference has no drift notion; this is part of the north-rule
generalization ("KS/PSI distribution-drift checks against a stored
baseline manifest", BASELINE.json).  Design for scale:

1. Each side is reduced to a fixed-width histogram with ONE
   ``groupBy(bucket)`` aggregation — the only pass over the data.
2. The statistic is computed over the (group × n_buckets)-row histogram
   frame, which is tiny regardless of input size; we keep that in Spark
   (window cumsum for KS) so the whole check stays a DataFrame program —
   nothing is collected until the caller acts.

Bucketing uses plain arithmetic (``floor((x-lo)/(hi-lo)*n)``) instead of
``width_bucket`` so the same formula runs verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucket_expr(col: str, lo: float, hi: float, n_buckets: int) -> F.Column:
    raw = F.floor((F.col(col) - F.lit(lo)) / F.lit(hi - lo) * F.lit(n_buckets))
    return F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), raw)).cast("int")


def histogram(df: DataFrame, col: str, lo: float, hi: float, n_buckets: int = 20) -> DataFrame:
    """(bucket, cnt) — one shuffle, map-side partial counts."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bucket_expr(col, lo, hi, n_buckets).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _densify(hist: DataFrame, n_buckets: int, cnt_name: str) -> DataFrame:
    """Left-join onto a full bucket spine so empty buckets appear as 0."""
    spark = hist.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    return spine.join(hist, "bucket", "left_outer").select(
        "bucket", F.coalesce(F.col("cnt"), F.lit(0)).alias(cnt_name)
    )


def psi(
    actual: DataFrame, baseline: DataFrame, col: str, lo: float, hi: float,
    n_buckets: int = 20, eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index as a 1-row DataFrame (psi double).

    PSI = Σ (p_i − q_i)·ln(p_i/q_i) with ε-smoothed proportions.
    Rule of thumb: <0.1 stable, 0.1–0.25 moderate, >0.25 drifted.
    """
    a = _densify(histogram(actual, col, lo, hi, n_buckets), n_buckets, "a_cnt")
    b = _densify(histogram(baseline, col, lo, hi, n_buckets), n_buckets, "b_cnt")
    j = a.join(b, "bucket")
    tot = j.agg(F.sum("a_cnt").alias("a_tot"), F.sum("b_cnt").alias("b_tot"))
    j = j.crossJoin(F.broadcast(tot))
    p = F.col("a_cnt") / F.col("a_tot") + F.lit(eps)
    q = F.col("b_cnt") / F.col("b_tot") + F.lit(eps)
    return j.agg(F.sum((p - q) * F.log(p / q)).alias("psi"))


def ks_statistic(
    actual: DataFrame, baseline: DataFrame, col: str, lo: float, hi: float, n_buckets: int = 200
) -> DataFrame:
    """Approximate two-sample KS statistic (max |ΔCDF| over bucket edges)
    as a 1-row DataFrame (ks double).  Resolution = 1/n_buckets."""
    a = _densify(histogram(actual, col, lo, hi, n_buckets), n_buckets, "a_cnt")
    b = _densify(histogram(baseline, col, lo, hi, n_buckets), n_buckets, "b_cnt")
    j = a.join(b, "bucket")
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    tot = j.agg(F.sum("a_cnt").alias("a_tot"), F.sum("b_cnt").alias("b_tot"))
    j = (
        j.crossJoin(F.broadcast(tot))
        .withColumn("a_cdf", F.sum("a_cnt").over(w) / F.col("a_tot"))
        .withColumn("b_cdf", F.sum("b_cnt").over(w) / F.col("b_tot"))
    )
    return j.agg(F.max(F.abs(F.col("a_cdf") - F.col("b_cdf"))).alias("ks"))


def drift_by_group(
    actual: DataFrame, baseline: DataFrame, col: str, group_col: str,
    lo: float, hi: float, n_buckets: int = 20, eps: float = 1e-6,
) -> DataFrame:
    """Per-group PSI (e.g. per partition_id vs the global baseline):
    (group, psi).  Both histograms in one shuffle each."""
    a = (
        actual.filter(F.col(col).isNotNull())
        .groupBy(group_col, bucket_expr(col, lo, hi, n_buckets).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("a_cnt"))
    )
    b = _densify(histogram(baseline, col, lo, hi, n_buckets), n_buckets, "b_cnt")
    groups = a.select(group_col).distinct()
    spine = groups.crossJoin(
        actual.sparkSession.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    )
    a = spine.join(a, [group_col, "bucket"], "left_outer").select(
        group_col, "bucket", F.coalesce(F.col("a_cnt"), F.lit(0)).alias("a_cnt")
    )
    j = a.join(F.broadcast(b), "bucket")
    a_tot = Window.partitionBy(group_col)
    j = j.withColumn("a_tot", F.sum("a_cnt").over(a_tot))
    btot = b.agg(F.sum("b_cnt").alias("b_tot"))
    j = j.crossJoin(F.broadcast(btot))
    p = F.col("a_cnt") / F.col("a_tot") + F.lit(eps)
    q = F.col("b_cnt") / F.col("b_tot") + F.lit(eps)
    return j.groupBy(group_col).agg(F.sum((p - q) * F.log(p / q)).alias("psi"))
