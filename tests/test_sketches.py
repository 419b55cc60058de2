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


class TestPartitionBloom:
    """1008-bit per-partition bloom fingerprints (point-lookup pruning)."""

    def test_no_false_negatives(self, spark):
        from hashio_spark.operators.sketches import (
            fingerprint_probe,
            partition_fingerprint,
        )

        df = spark.range(2000).select(
            F.concat(F.lit("k"), F.col("id")).alias("key"),
            F.pmod(F.col("id"), F.lit(8)).cast("int").alias("part"),
        )
        fp = partition_fingerprint(df, "part", "key")
        present = df.filter(F.col("id") % 97 == 0)  # 21 probes
        hits = fingerprint_probe(fp, present.select("key"), "part", "key")
        misses = present.join(hits, ["key", "part"], "left_anti").count()
        assert misses == 0

    def test_absent_keys_mostly_pruned(self, spark):
        from hashio_spark.operators.sketches import (
            fingerprint_probe,
            partition_fingerprint,
        )

        df = spark.range(800).select(
            F.concat(F.lit("k"), F.col("id")).alias("key"),
            F.pmod(F.col("id"), F.lit(8)).cast("int").alias("part"),
        )
        fp = partition_fingerprint(df, "part", "key")
        absent = spark.range(100).select(F.concat(F.lit("absent"), F.col("id")).alias("key"))
        hits = fingerprint_probe(fp, absent, "part", "key").count()
        # 100 keys × 8 partitions = 800 pairs; 100 keys/partition at
        # m=1008,k=4 → fp ≈ (1-e^(-400/1008))^4 ≈ 1.2% ≈ 10 expected
        assert hits < 40

    def test_serialize_roundtrip(self, spark):
        from hashio_spark.operators.sketches import (
            bloom_deserialize_exprs,
            bloom_serialize_expr,
            partition_fingerprint,
        )

        df = spark.range(500).select(
            F.col("id").cast("string").alias("key"),
            F.pmod(F.col("id"), F.lit(4)).cast("int").alias("part"),
        )
        fp = partition_fingerprint(df, "part", "key")
        ser = fp.select("part", bloom_serialize_expr().alias("b"))
        back = ser.select("part", *bloom_deserialize_exprs(F.col("b")))
        orig = {r["part"]: [r[f"lane_{i:02d}"] for i in range(16)] for r in fp.collect()}
        rt = {r["part"]: [r[f"lane_{i:02d}"] for i in range(16)] for r in back.collect()}
        assert orig == rt

    def test_manifest_probe_end_to_end(self, spark):
        from hashio_spark.operators.sketches import BLOOM_KEY, manifest_probe

        # 100 keys/partition: fp ≈ 1.2% per fingerprint, and md5 keys are
        # deterministic so the exact hit set is pinned, not flaky
        a = validate(_docs(spark, 0, 400), checks=frozenset(), with_sketches=True)
        b = validate(_docs(spark, 400, 800), checks=frozenset(), with_sketches=True)
        m = manifest_rows(a, "runA", "xxh64").unionByName(
            manifest_rows(b, "runB", "xxh64")
        )
        keys = m.select(F.map_keys("stats").alias("k")).first()["k"]
        assert BLOOM_KEY in keys

        probes = spark.createDataFrame(
            [("42",), ("650",), ("999999",)], "doc_id string"
        )
        hits = manifest_probe(m, probes).collect()
        got = {(r["doc_id"], r["run_id"]) for r in hits}
        # present keys MUST hit the run that holds them — no false negatives
        assert ("42", "runA") in got
        assert ("650", "runB") in got
        # absent key prunes everything at this density (verified against
        # the deterministic md5 bit pattern; false positives are possible
        # in general but this exact probe/corpus pair has none)
        assert not any(k == "999999" for k, _ in got)

    def test_legacy_rows_without_bloom_dropped(self, spark):
        from hashio_spark.operators.sketches import manifest_probe

        legacy = validate(_docs(spark, 0, 100), checks=frozenset())
        m = manifest_rows(legacy, "legacy", "xxh64")
        probes = spark.createDataFrame([("42",)], "doc_id string")
        assert manifest_probe(m, probes).count() == 0
