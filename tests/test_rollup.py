"""Tree-hash rollups, observe counters, format_bytes."""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from hashio_spark.operators.rollup import (
    dataset_digest,
    format_bytes,
    observe_counters,
    ordered_digest_expr,
    run_summary,
)


def test_ordered_digest_order_sensitivity(spark):
    a = spark.createDataFrame(pd.DataFrame({"o": [1, 2, 3], "h": ["x", "y", "z"]}))
    got = a.agg(ordered_digest_expr("o", "h").alias("d")).first()["d"]
    assert got == hashlib.md5(b"xyz").hexdigest()
    # same items, different order keys → different digest
    b = spark.createDataFrame(pd.DataFrame({"o": [3, 2, 1], "h": ["x", "y", "z"]}))
    got_b = b.agg(ordered_digest_expr("o", "h").alias("d")).first()["d"]
    assert got_b == hashlib.md5(b"zyx").hexdigest()


def test_dataset_digest_partition_invariant(spark, docs, catalog):
    from hashio_spark.plans.validate import validate

    r1 = validate(docs, catalog).report
    r2 = validate(docs.repartition(7), catalog).report
    d1 = dataset_digest(r1).first()["dataset_digest"]
    d2 = dataset_digest(r2).first()["dataset_digest"]
    assert d1 == d2 and len(d1) == 32


def test_observe_counters(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") * 10).alias("size"))
    df2, obs = observe_counters(df, size_col="size")
    df2.count()
    assert obs.get["rows"] == 100
    assert obs.get["bytes"] == sum(i * 10 for i in range(100))
    s = run_summary(obs.get["rows"], obs.get["bytes"], 2.0)
    assert s["rows_per_sec"] == 50.0 and "pretty_bytes" in s


def test_format_bytes():
    assert format_bytes(512) == "512.0 B"
    assert format_bytes(2048) == "2.0 KB"
    assert format_bytes(5 * 1024**3) == "5.0 GB"
    assert format_bytes(3 * 1024**5) == "3072.0 TB" or format_bytes(3 * 1024**5).endswith("PB")
