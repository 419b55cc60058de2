"""Row-count anomaly scoring (operators/anomaly.py): corpus groups and
stored manifest runs."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hashio_spark.operators.anomaly import (
    count_outliers,
    count_zscores,
    manifest_count_outliers,
)


def _df_with_counts(spark, sizes: dict[str, int]):
    rows = [(k,) for k, n in sizes.items() for _ in range(n)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["k"]))


def test_zscores_match_population_formula(spark):
    sizes = {"a": 10, "b": 12, "c": 11, "d": 30}
    df = _df_with_counts(spark, sizes)
    got = {r["k"]: (r["n"], r["z"]) for r in count_zscores(df, "k").collect()}
    ns = list(sizes.values())
    mu = sum(ns) / len(ns)
    sigma = math.sqrt(sum(x * x for x in ns) / len(ns) - mu * mu)
    for k, n in sizes.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(round((n - mu) / sigma, 4), abs=1e-9)


def test_outliers_filter_and_degenerate_population(spark):
    sizes = {"a": 10, "b": 10, "c": 10, "d": 10, "e": 10, "f": 100}
    out = count_outliers(_df_with_counts(spark, sizes), "k", z_threshold=2.0).collect()
    assert [r["k"] for r in out] == ["f"]
    # uniform population: all z = 0, nothing flagged
    uni = _df_with_counts(spark, {"a": 5, "b": 5})
    assert count_zscores(uni, "k").filter(F.col("z") != 0).count() == 0
    assert count_outliers(uni, "k", 0.5).count() == 0
    # single group: sigma = 0 -> z = 0, no NaN/null
    one = count_zscores(_df_with_counts(spark, {"only": 7}), "k").collect()
    assert one[0]["z"] == 0.0
    with pytest.raises(ValueError, match="z_threshold"):
        count_outliers(uni, "k", 0)
    with pytest.raises(ValueError, match="collide"):
        count_zscores(uni.withColumnRenamed("k", "z"), "z")


def test_precomputed_counts_path(spark):
    counts = spark.createDataFrame(
        pd.DataFrame({"p": ["p0", "p1", "p2"], "row_count": [100, 100, 10]})
    )
    out = count_outliers(counts, "p", z_threshold=1.0, count_col="row_count").collect()
    assert [r["p"] for r in out] == ["p2"]


def test_manifest_count_outliers_from_store(spark, docs, catalog, tmp_path):
    """Full loop: validate -> manifest -> score partitions from the
    store alone.  A run with one gutted partition flags exactly it;
    multi-algo rows don't double-count."""
    from hashio_spark.plans.validate import manifest_rows, validate
    from hashio_spark.sources.manifest_store import ManifestStore

    store = ManifestStore(spark, str(tmp_path / "anom"))
    p0 = docs.select(F.min("partition_id")).collect()[0][0]
    # drop ~90% of one partition's rows
    gutted = docs.filter(
        (F.col("partition_id") != F.lit(p0)) | (F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0)
    )
    res = validate(gutted, catalog, extra_algos=("sha256",))
    store.merge(manifest_rows(res, "r1", "md5", extra_algos=("sha256",)))
    flagged = manifest_count_outliers(store, "r1", z_threshold=2.0).collect()
    assert [r["partition_id"] for r in flagged] == [p0]
    assert flagged[0]["z"] < 0
    # algo pin gives the same answer as the dedup default
    pinned = manifest_count_outliers(store, "r1", z_threshold=2.0, algo="sha256").collect()
    assert [r["partition_id"] for r in pinned] == [p0]


def test_cli_outliers_subcommand(spark, docs, catalog, tmp_path, capsys):
    import json as _json

    from hashio_spark.cli import main
    from hashio_spark.plans.validate import manifest_rows, validate
    from hashio_spark.sources.manifest_store import ManifestStore

    store = ManifestStore(spark, str(tmp_path / "anomcli"))
    p0 = docs.select(F.min("partition_id")).collect()[0][0]
    gutted = docs.filter(
        (F.col("partition_id") != F.lit(p0)) | (F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0)
    )
    store.merge(manifest_rows(validate(gutted, catalog), "r1", "md5"))
    rc = main(["outliers", "--manifest", str(tmp_path / "anomcli"),
               "--run-id", "r1", "--z-threshold", "2.0"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert _json.loads(out[-1]) == {"run_id": "r1", "outlier_partitions": 1}
    assert out[0].startswith("!") and f"partition={p0}" in out[0]
