"""Verify & diff: manifest↔live classification and run-vs-run diffs.

Spark re-expressions of the reference's three comparison entry points:

* :func:`verify_manifest` — ``verify_checksums``
  (``/root/reference/lib/hashio/encoder.py:651-705``): left-outer join of
  the stored manifest against the live table; classification column
  replaces the imperative branch ladder (missing → warn
  ``encoder.py:688-690``; mtime equal → silent skip ``:692-693``; digest
  differs → violation ``:703-705``).
* :func:`verify_manifests` — ``verify_caches``
  (``encoder.py:708-742``): match by (key, digest), then rescue renames by
  (name, digest), remainder = violations.
* :func:`snapshot_diff` — ``Cache.diff_snapshots``
  (``/root/reference/lib/hashio/cache.py:554-648``): ONE full-outer join +
  a ``when`` chain replaces its three SQL queries + Python set cleanup —
  the add∧remove false-positive fixup (``cache.py:633-646``) cannot occur
  because a key present on both sides is classified exactly once.

All three are single-shuffle equi-joins on the manifest key; with both
sides bucketed/partitioned on the key the shuffle disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_MISSING = "missing"
STATUS_SKIP = "skip"  # freshness token matches → digest not recomputed
STATUS_PASS = "pass"
STATUS_VIOLATION = "violation"


def verify_manifest(
    manifest: DataFrame,
    live: DataFrame,
    key: str = "doc_id",
    digest: str = "digest",
    freshness: str | None = None,
) -> DataFrame:
    """Classify every manifest row against the live table.

    ``freshness`` names an optional mtime-analog column present on both
    sides: when equal, the row is skipped without digest comparison —
    the reference's mtime short-circuit (``encoder.py:692-693``).
    Output: key, status, old_digest, new_digest.
    """
    m = manifest.select(
        F.col(key).alias("_key"),
        F.col(digest).alias("old_digest"),
        *([F.col(freshness).alias("_m_fresh")] if freshness else []),
    )
    t = live.select(
        F.col(key).alias("_key"),
        F.col(digest).alias("new_digest"),
        *([F.col(freshness).alias("_t_fresh")] if freshness else []),
    )
    j = m.join(t, "_key", "left_outer")
    status = F.when(F.col("new_digest").isNull(), STATUS_MISSING)
    if freshness:
        status = status.when(F.col("_m_fresh") == F.col("_t_fresh"), STATUS_SKIP)
    status = status.when(F.col("old_digest") == F.col("new_digest"), STATUS_PASS).otherwise(STATUS_VIOLATION)
    return j.select(F.col("_key").alias(key), status.alias("status"), "old_digest", "new_digest")


def verify_manifests(
    m1: DataFrame,
    m2: DataFrame,
    key: str = "doc_id",
    digest: str = "digest",
    name: str | None = None,
) -> DataFrame:
    """Manifest-vs-manifest verify with rename rescue (``verify_caches``).

    Rows of ``m1`` not matched in ``m2`` by (key, digest) are re-matched by
    (name, digest) when ``name`` is given (the reference's fallback scan
    ``encoder.py:733-737``); still-unmatched rows are emitted as
    violations.
    """
    cols = [key, digest] + ([name] if name else [])
    left = m1.select(*cols)
    unmatched = left.join(m2.select(key, digest), [key, digest], "left_anti")
    if name:
        rescued = unmatched.join(m2.select(name, digest).distinct(), [name, digest], "left_semi")
        unmatched = unmatched.join(rescued.select(key), key, "left_anti")
    return unmatched.select(key, digest).withColumn("status", F.lit(STATUS_VIOLATION))


def dedupe_manifests(
    target: DataFrame,
    source: DataFrame,
    key: str = "doc_id",
    digest: str = "digest",
    max_digest_group: int = 64,
) -> DataFrame:
    """Cross-manifest dedupe → (target_key, source_key, category), the
    reference's four-category contract (``dedupe_cache_gen``,
    ``/root/reference/lib/hashio/encoder.py:503-597``):

    * ``dupe_same_key``  — keys match, digests match (dupe)
    * ``changed``        — keys match, digests differ
    * ``dupe_moved``     — digests match under different keys
      (copy + rename/move)
    * ``only_target`` / ``only_source`` — key present on one side only

    Two equi-joins: full-outer on key (the reference's path loop) plus an
    inner join on digest for the moved-pair rescue.  ``max_digest_group``
    caps pathological digest groups (the empty file, boilerplate) exactly
    like the LSH band cap — without it a digest shared by c keys emits
    c² moved pairs.
    """
    t = target.select(F.col(key).alias("target_key"), F.col(digest).alias("t_digest"))
    s = source.select(F.col(key).alias("source_key"), F.col(digest).alias("s_digest"))

    by_key = t.join(s, t["target_key"] == s["source_key"], "full_outer").select(
        "target_key",
        "source_key",
        F.when(F.col("t_digest").isNull(), "only_source")
        .when(F.col("s_digest").isNull(), "only_target")
        .when(F.col("t_digest") == F.col("s_digest"), "dupe_same_key")
        .otherwise("changed")
        .alias("category"),
    )

    t_sizes = t.groupBy("t_digest").agg(F.count(F.lit(1)).alias("_tn"))
    s_sizes = s.groupBy("s_digest").agg(F.count(F.lit(1)).alias("_sn"))
    t_ok = t.join(t_sizes.filter(F.col("_tn") <= max_digest_group), "t_digest").drop("_tn")
    s_ok = s.join(s_sizes.filter(F.col("_sn") <= max_digest_group), "s_digest").drop("_sn")
    moved = (
        t_ok.join(s_ok, t_ok["t_digest"] == s_ok["s_digest"])
        .filter(F.col("target_key") != F.col("source_key"))
        .select("target_key", "source_key", F.lit("dupe_moved").alias("category"))
    )
    return by_key.unionByName(moved)


def snapshot_diff(
    snap1: DataFrame, snap2: DataFrame, key: str = "doc_id", digest: str = "digest"
) -> DataFrame:
    """Run-vs-run diff → (key, change ∈ {added, removed, changed}).

    One full-outer join; unchanged rows are filtered out.  Output ordering
    is left to the caller (the reference sorts for printing,
    ``cache.py:642-646``).
    """
    s1 = snap1.select(F.col(key).alias("_key"), F.col(digest).alias("_d1"))
    s2 = snap2.select(F.col(key).alias("_key"), F.col(digest).alias("_d2"))
    j = s1.join(s2, "_key", "full_outer")
    change = (
        F.when(F.col("_d1").isNull(), "added")
        .when(F.col("_d2").isNull(), "removed")
        .when(F.col("_d1") != F.col("_d2"), "changed")
    )
    return (
        j.select(F.col("_key").alias(key), change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


def partition_history(store, partition_id: str, algo: str | None = None) -> DataFrame:
    """Audit trail for ONE partition across the store's whole run history
    — "git log" for a table slice, answered from the manifest alone (no
    corpus rescan at any scale; the filtered slice is O(runs × algos)
    rows).

    Each row carries the run's digest, row_count and lineage plus
    ``changed`` = digest differs from the SAME algo's previous run
    (first appearance counts as changed).  Ordering is by ``updated_at``
    then run_id — the merge timeline, not lexical run names.  The window
    is partitioned per algo over a few-row slice, so the single-partition
    sort Spark plans here is manifest-sized, never corpus-sized.
    """
    from pyspark.sql import Window

    m = store.read().filter(F.col("partition_id") == partition_id)
    if algo is not None:
        m = m.filter(F.col("algo") == algo)
    w = Window.partitionBy("algo").orderBy("updated_at", "run_id")
    prev = F.lag("digest").over(w)
    return (
        m.select("run_id", "algo", "digest", "row_count", "lineage", "updated_at")
        .withColumn("changed", prev.isNull() | (F.col("digest") != prev))
        .orderBy("updated_at", "run_id", "algo")
    )
