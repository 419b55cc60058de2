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


def test_manifest_drift_stored_baseline_roundtrip(spark, docs, catalog, tmp_path):
    """Full stored-baseline loop: validate -> manifest (quality_hist in
    stats map) -> per-partition PSI between two stored runs, with the
    document table never rescanned.  An identical re-run shows ~0 PSI;
    a run with shifted quality drifts on every partition."""
    from hashio_spark.operators.drift import manifest_drift
    from hashio_spark.plans.validate import manifest_rows, validate
    from hashio_spark.sources.manifest_store import ManifestStore

    store = ManifestStore(spark, str(tmp_path / "dm"))
    res_a = validate(docs, catalog)
    assert "quality_hist" in res_a.report.columns
    store.merge(manifest_rows(res_a, "base", "md5"))
    # identical distribution -> psi ~ 0 everywhere
    store.merge(manifest_rows(validate(docs, catalog), "same", "md5"))
    same = manifest_drift(store, "base", "same").collect()
    assert len(same) == 8 and all(not r["drifted"] and abs(r["psi"]) < 1e-6 for r in same)
    # shift quality into [0.5, 1] -> strong drift on every partition
    shifted = docs.withColumn("quality", F.col("quality") / 2 + 0.5)
    store.merge(manifest_rows(validate(shifted, catalog), "shifted", "md5"))
    drifted = manifest_drift(store, "base", "shifted").collect()
    assert len(drifted) == 8 and all(r["drifted"] and r["psi"] > 0.25 for r in drifted)


def test_cli_drift_subcommand(spark, docs, catalog, tmp_path, capsys):
    from hashio_spark.cli import main
    from hashio_spark.plans.validate import manifest_rows, validate
    from hashio_spark.sources.manifest_store import ManifestStore

    import json as _json

    store = ManifestStore(spark, str(tmp_path / "dmc"))
    store.merge(manifest_rows(validate(docs, catalog), "a", "md5"))
    shifted = docs.withColumn("quality", F.col("quality") / 2 + 0.5)
    store.merge(manifest_rows(validate(shifted, catalog), "b", "md5"))
    rc = main(["drift", "--manifest", str(tmp_path / "dmc"), "--run-id", "a", "--other-run", "b"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert _json.loads(out[-1])["drifted_partitions"] == 8
    assert sum(1 for ln in out[:-1] if ln.startswith("!")) == 8


def test_manifest_drift_mismatched_bucket_counts_dropped(spark, tmp_path):
    """Histograms with different bucket counts (manifests written by
    different engine versions) are dropped, never surfaced as NULL psi —
    a NULL here crashed cmd_drift's formatting (round-3 ADVICE)."""
    import datetime

    from hashio_spark.operators.drift import manifest_drift
    from hashio_spark.sources.manifest_store import MANIFEST_SCHEMA, ManifestStore

    store = ManifestStore(spark, str(tmp_path / "dmm"))
    now = datetime.datetime(2026, 1, 1)

    def row(run, part, hist):
        return (run, part, "md5", "d", 10, {"quality_hist": hist}, "", now)

    store.merge(spark.createDataFrame(
        [row("a", 0, "1,2,3,4"), row("a", 1, "4,3,2,1")], MANIFEST_SCHEMA))
    store.merge(spark.createDataFrame(
        [row("b", 0, "1,2,3"), row("b", 1, "1,2,3,4")], MANIFEST_SCHEMA))
    out = manifest_drift(store, "a", "b").collect()
    assert [r["partition_id"] for r in out] == [1]
    assert all(r["psi"] is not None and r["drifted"] is not None for r in out)


def test_drift_timeseries_orders_by_ingest_and_flags_the_jump(spark, docs, catalog, tmp_path):
    """Three stored runs (base -> same -> shifted): the series has two
    consecutive pairs in updated_at order; the first is quiet, the jump
    shows up only in the second."""
    from hashio_spark.operators.drift import drift_timeseries
    from hashio_spark.plans.validate import manifest_rows, validate
    from hashio_spark.sources.manifest_store import ManifestStore

    store = ManifestStore(spark, str(tmp_path / "dts"))
    store.merge(manifest_rows(validate(docs, catalog), "base", "md5"))
    store.merge(manifest_rows(validate(docs, catalog), "same", "md5"))
    shifted = docs.withColumn("quality", F.col("quality") / 2 + 0.5)
    store.merge(manifest_rows(validate(shifted, catalog), "shifted", "md5"))

    rows = drift_timeseries(store).collect()
    assert [(r.run_a, r.run_b) for r in rows] == [("base", "same"), ("same", "shifted")]
    quiet, jump = rows
    assert quiet.n_drifted == 0 and abs(quiet.max_psi) < 1e-6
    assert jump.n_drifted == 8 and jump.max_psi > 0.25
    assert all(r.n_partitions == 8 for r in rows)


def test_drift_timeseries_single_run_is_empty(spark, docs, catalog, tmp_path):
    from hashio_spark.operators.drift import drift_timeseries
    from hashio_spark.plans.validate import manifest_rows, validate
    from hashio_spark.sources.manifest_store import ManifestStore

    store = ManifestStore(spark, str(tmp_path / "dt1"))
    store.merge(manifest_rows(validate(docs, catalog), "only", "md5"))
    out = drift_timeseries(store)
    assert out.count() == 0
    assert out.columns == ["run_a", "run_b", "n_partitions", "n_drifted", "max_psi", "mean_psi"]


def test_cli_trend_subcommand(spark, docs, catalog, tmp_path, capsys):
    from hashio_spark.cli import main
    from hashio_spark.plans.validate import manifest_rows, validate
    from hashio_spark.sources.manifest_store import ManifestStore

    import json as _json

    store = ManifestStore(spark, str(tmp_path / "dtc"))
    store.merge(manifest_rows(validate(docs, catalog), "r1", "md5"))
    shifted = docs.withColumn("quality", F.col("quality") / 2 + 0.5)
    store.merge(manifest_rows(validate(shifted, catalog), "r2", "md5"))
    rc = main(["trend", "--manifest", str(tmp_path / "dtc")])
    assert rc == 0
    out = [_json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert out[-1] == {"pairs": 1, "drifted_pairs": 1}
    assert (out[0]["run_a"], out[0]["run_b"], out[0]["n_drifted"]) == ("r1", "r2", 8)
