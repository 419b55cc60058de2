"""Verify/diff semantics tests, incl. tamper detection (mirrors the
reference's gzip verify e2e + snapshot diff suites,
test_hashio.py:523-599 and cache.py diff semantics)."""

from pyspark.sql import functions as F

from hashio_spark.functions.canonical import doc_digest_expr
from hashio_spark.operators.verify import snapshot_diff, verify_manifest, verify_manifests


def _digested(docs):
    return docs.select("doc_id", "partition_id", doc_digest_expr("spans", "md5").alias("digest")).dropDuplicates(
        ["doc_id"]
    )


def test_verify_manifest_tamper(spark, docs):
    m = _digested(docs)
    # live table: tamper 10 docs, drop 5
    live = (
        m.withColumn(
            "digest",
            F.when(F.col("doc_id").substr(-2, 2).isin("11", "22"), F.lit("tampered")).otherwise(F.col("digest")),
        )
        .filter(~F.col("doc_id").substr(-2, 2).isin("33"))
    )
    out = verify_manifest(m, live, key="doc_id", digest="digest")
    by = {r["status"]: r["n"] for r in out.groupBy("status").agg(F.count("*").alias("n")).collect()}
    n_tampered = m.filter(F.col("doc_id").substr(-2, 2).isin("11", "22")).count()
    n_missing = m.filter(F.col("doc_id").substr(-2, 2).isin("33")).count()
    total = m.count()
    assert by.get("violation", 0) == n_tampered
    assert by.get("missing", 0) == n_missing
    assert by.get("pass", 0) == total - n_tampered - n_missing


def test_verify_manifest_freshness_skip(spark, docs):
    """mtime-analog short-circuit: equal freshness → skip, digest ignored
    (reference encoder.py:692-693)."""
    m = _digested(docs).withColumn("mtime", F.lit(100))
    live = m.withColumn("digest", F.lit("would-be-violation"))
    live_fresh = live.withColumn("mtime", F.lit(100))
    out = verify_manifest(m, live_fresh, freshness="mtime")
    assert out.filter(F.col("status") != "skip").count() == 0
    live_stale = live.withColumn("mtime", F.lit(200))
    out2 = verify_manifest(m, live_stale, freshness="mtime")
    assert out2.filter(F.col("status") != "violation").count() == 0


def test_verify_manifests_rename_rescue(spark):
    """Rows moved to a new key but identical (name, digest) are rescued
    (reference encoder.py:733-737); real mismatches are violations."""
    m1 = spark.createDataFrame(
        [("p/a", "h1", "a"), ("p/b", "h2", "b"), ("p/c", "h3", "c")], "doc_id string, digest string, name string"
    )
    m2 = spark.createDataFrame(
        [("q/a", "h1", "a"),   # renamed: rescued
         ("p/b", "h2", "b"),   # exact match
         ("p/c", "HX", "c")],  # digest mismatch: violation
        "doc_id string, digest string, name string",
    )
    out = verify_manifests(m1, m2, key="doc_id", digest="digest", name="name")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == "p/c"


def test_snapshot_diff_semantics(spark):
    s1 = spark.createDataFrame([("a", "h1"), ("b", "h2"), ("c", "h3")], "doc_id string, digest string")
    s2 = spark.createDataFrame([("b", "h2"), ("c", "HX"), ("d", "h4")], "doc_id string, digest string")
    out = {r["doc_id"]: r["change"] for r in snapshot_diff(s1, s2).collect()}
    # unchanged 'b' absent; removed/changed/added exact
    assert out == {"a": "removed", "c": "changed", "d": "added"}


def test_snapshot_diff_no_false_add_remove_pairs(spark, docs):
    """The reference needs a Python cleanup for items appearing as both
    added and removed (cache.py:633-646); the full-outer formulation makes
    that state unrepresentable."""
    m = _digested(docs)
    out = snapshot_diff(m, m)
    assert out.count() == 0


def test_dedupe_manifests_four_categories(spark):
    """Reference dedupe_cache_gen 4-category contract
    (encoder.py:503-597) on a tiny planted layout."""
    import pandas as pd

    from hashio_spark.operators.verify import dedupe_manifests

    target = spark.createDataFrame(pd.DataFrame(
        [("a", "h1"), ("b", "h2"), ("c", "h3"), ("e", "h5")],
        columns=["doc_id", "digest"]))
    source = spark.createDataFrame(pd.DataFrame(
        [("a", "h1"),        # same key, same digest  -> dupe_same_key
         ("b", "hX"),        # same key, diff digest  -> changed
         ("c2", "h3"),       # renamed copy of c      -> only_source + dupe_moved
         ("d", "h9")],       # new                    -> only_source
        columns=["doc_id", "digest"]))
    out = {(r["target_key"], r["source_key"], r["category"])
           for r in dedupe_manifests(target, source).collect()}
    assert ("a", "a", "dupe_same_key") in out
    assert ("b", "b", "changed") in out
    assert (None, "c2", "only_source") in out
    assert (None, "d", "only_source") in out
    assert ("c", None, "only_target") in out
    assert ("e", None, "only_target") in out
    assert ("c", "c2", "dupe_moved") in out
    assert len(out) == 7


def test_partition_history_audit_trail(spark, tmp_path):
    """Three runs over one partition: changed flags mark first appearance
    and digest moves, per algo; manifest-only (no corpus involved)."""
    import datetime

    from hashio_spark.operators.verify import partition_history
    from hashio_spark.sources.manifest_store import ManifestStore, MANIFEST_SCHEMA

    store = ManifestStore(spark, str(tmp_path / "m"))
    t0 = datetime.datetime(2024, 1, 1)

    def rows(run, digest, ts_off, algo="xxh64"):
        return spark.createDataFrame(
            [(run, 3, algo, digest, 10, {"n": "10"}, f"job={run}",
              t0 + datetime.timedelta(hours=ts_off))],
            MANIFEST_SCHEMA,
        )

    store.merge(rows("r1", "aaaa", 0))
    store.merge(rows("r2", "aaaa", 1))   # unchanged
    store.merge(rows("r3", "bbbb", 2))   # changed
    store.merge(rows("r2", "zzzz", 1, algo="md5"))  # other algo, own chain
    # another partition must not leak in
    store.merge(spark.createDataFrame(
        [("r1", 4, "xxh64", "cccc", 5, {}, "", t0)], MANIFEST_SCHEMA))

    h = partition_history(store, 3).collect()
    assert [r.run_id for r in h] == ["r1", "r2", "r2", "r3"]
    x = [(r.run_id, r.algo, bool(r.changed)) for r in h]
    assert ("r1", "xxh64", True) in x     # first appearance
    assert ("r2", "xxh64", False) in x    # same digest
    assert ("r3", "xxh64", True) in x     # digest moved
    assert ("r2", "md5", True) in x       # independent per-algo chain
    only = partition_history(store, 3, algo="xxh64").collect()
    assert all(r.algo == "xxh64" for r in only) and len(only) == 3
