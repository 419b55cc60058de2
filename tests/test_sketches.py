"""Manifest-borne HLL distinct sketches (operators/sketches.py): the
stored sketch answers cross-run distinct-count questions from manifest
rows alone — no corpus rescan — and the union handles run overlap that
summing per-run counts would double-count."""

import pytest
from pyspark.sql import functions as F

from hashio_spark.operators.sketches import SKETCH_KEY, merged_distinct
from hashio_spark.plans.validate import manifest_rows, validate


def _docs(spark, lo, hi):
    """Interleaved-doc-shaped frame with doc_ids [lo, hi)."""
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").cast("string").alias("doc_id"),
            F.pmod(F.col("id"), F.lit(4)).cast("int").alias("partition_id"),
            F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    F.concat(F.lit("t-"), F.col("id")).alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            ).alias("spans"),
        )
    )


@pytest.fixture(scope="module")
def two_run_manifests(spark):
    # run A: ids [0, 3000); run B: [2000, 5000) — 1000 overlap, 5000 true
    a = validate(_docs(spark, 0, 3000), checks=frozenset(), with_sketches=True)
    b = validate(_docs(spark, 2000, 5000), checks=frozenset(), with_sketches=True)
    ma = manifest_rows(a, "runA", "xxh64")
    mb = manifest_rows(b, "runB", "xxh64")
    return ma.unionByName(mb).cache()


def test_sketch_lands_in_report_and_stats_map(spark):
    res = validate(_docs(spark, 0, 100), checks=frozenset(), with_sketches=True)
    assert SKETCH_KEY in res.report.columns
    m = manifest_rows(res, "r", "xxh64")
    keys = m.select(F.map_keys("stats").alias("k")).first()["k"]
    assert SKETCH_KEY in keys


def test_merged_distinct_global_handles_overlap(two_run_manifests):
    est = merged_distinct(two_run_manifests).first()["distinct_estimate"]
    # naive sum of per-run counts would say 6000; truth is 5000
    assert abs(est - 5000) / 5000 < 0.05


def test_merged_distinct_per_run(two_run_manifests):
    per = {
        r["run_id"]: r["distinct_estimate"]
        for r in merged_distinct(two_run_manifests, by=("run_id",)).collect()
    }
    assert abs(per["runA"] - 3000) / 3000 < 0.05
    assert abs(per["runB"] - 3000) / 3000 < 0.05


def test_rows_without_sketch_are_dropped(spark, two_run_manifests):
    legacy = validate(_docs(spark, 0, 500), checks=frozenset())  # no sketches
    m = manifest_rows(legacy, "legacy", "xxh64")
    mixed = two_run_manifests.unionByName(m)
    per = merged_distinct(mixed, by=("run_id",))
    assert {r["run_id"] for r in per.collect()} == {"runA", "runB"}


def test_sketchless_validate_unchanged(spark):
    res = validate(_docs(spark, 0, 100), checks=frozenset())
    assert SKETCH_KEY not in res.report.columns
