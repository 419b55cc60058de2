"""Drift operators: PSI/KS flag the planted drifted partition (datagen
shifts partition 0's quality distribution) and stay quiet on same-dist."""

from pyspark.sql import functions as F

from hashio_spark.datagen import DRIFT_PARTITION
from hashio_spark.operators.drift import drift_by_group, histogram, ks_statistic, psi


def test_histogram_counts(spark):
    df = spark.range(1000).select((F.col("id") / 1000.0).alias("x"))
    h = {r["bucket"]: r["cnt"] for r in histogram(df, "x", 0.0, 1.0, 10).collect()}
    assert sum(h.values()) == 1000
    assert all(abs(v - 100) <= 1 for v in h.values())


def test_psi_zero_for_identical(spark, docs):
    out = psi(docs, docs, "quality", 0.0, 1.0, 20).first()["psi"]
    assert abs(out) < 1e-9


def test_psi_flags_planted_drift(spark, docs):
    drifted = docs.filter(F.col("partition_id") == DRIFT_PARTITION)
    normal = docs.filter(F.col("partition_id") != DRIFT_PARTITION)
    p = psi(drifted, normal, "quality", 0.0, 1.0, 20).first()["psi"]
    assert p > 0.25  # "drifted" by the standard PSI rule of thumb


def test_ks_flags_planted_drift(spark, docs):
    drifted = docs.filter(F.col("partition_id") == DRIFT_PARTITION)
    normal = docs.filter(F.col("partition_id") != DRIFT_PARTITION)
    k = ks_statistic(drifted, normal, "quality", 0.0, 1.0, 100).first()["ks"]
    # planted shift maps quality to [0.5, 1] → CDF gap ≈ 0.5
    assert k > 0.3


def test_drift_by_group_ranks_partitions(spark, docs):
    baseline = docs.filter(F.col("partition_id") != DRIFT_PARTITION)
    out = {r["partition_id"]: r["psi"] for r in
           drift_by_group(docs, baseline, "quality", "partition_id", 0.0, 1.0, 20).collect()}
    worst = max(out, key=out.get)
    assert worst == DRIFT_PARTITION
    others = [v for k, v in out.items() if k != DRIFT_PARTITION]
    assert out[DRIFT_PARTITION] > 5 * max(others)
