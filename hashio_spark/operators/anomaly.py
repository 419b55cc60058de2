"""Row-count anomaly detection — which partitions/groups are the wrong
size?

A validation run that reports per-partition stats can also answer the
operational question the reference's ``--summarize`` loop hints at
(``/root/reference/lib/hashio/cli.py:495-512`` totals): which groups
deviate enough from their peers to suggest an ingest bug — a partition
that silently dropped half its rows, a source that double-loaded.

``count_zscores`` computes per-group counts (or takes pre-computed
counts, e.g. manifest ``row_count`` rows) and scores each group against
the population: ``z = (n - mean) / stddev``.  The variance is computed
from EXACT integer sums (``sum(n)``, ``sum(n²)`` are longs; counts at
any realistic group size keep ``n² · groups`` far below 2^63) rather
than a streaming moment aggregation — so the result is bit-identical
regardless of partial-merge order, replayable by any engine from the
same counts.  The stats side is ONE scalar row broadcast back onto the
groups: two map-side-combined aggregations and a broadcast join, no
group ever ships its rows anywhere.

``manifest_count_outliers`` applies the same scoring to a stored run's
manifest rows — manifest-sized work, the corpus is never rescanned.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_zscores(
    df: DataFrame,
    keys: str | Sequence[str],
    count_col: str | None = None,
    round_to: int | None = 4,
) -> DataFrame:
    """(keys…, n, z) for every group.  ``count_col=None`` counts rows per
    group; otherwise ``df`` is already (keys…, count) rows (manifest
    path).  A single-group or zero-variance population scores z=0."""
    kcols = [keys] if isinstance(keys, str) else list(keys)
    clash = set(kcols) & {"n", "z"}
    if clash:
        raise ValueError(f"key columns collide with output names: {sorted(clash)}")
    if count_col is None:
        counts = df.groupBy(*kcols).agg(F.count(F.lit(1)).alias("n"))
    else:
        counts = df.select(*kcols, F.col(count_col).cast("long").alias("n"))
    stats = counts.agg(
        F.sum("n").alias("_s1"),
        F.sum(F.col("n") * F.col("n")).alias("_s2"),
        F.count(F.lit(1)).alias("_g"),
    )
    mu = F.col("_s1") / F.col("_g")
    var = F.col("_s2") / F.col("_g") - mu * mu
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(sigma > 0, (F.col("n") - mu) / sigma).otherwise(F.lit(0.0))
    if round_to is not None:
        z = F.round(z, round_to)
    return counts.crossJoin(F.broadcast(stats)).select(*kcols, "n", z.alias("z"))


def count_outliers(
    df: DataFrame,
    keys: str | Sequence[str],
    z_threshold: float = 3.0,
    count_col: str | None = None,
) -> DataFrame:
    """Groups whose count deviates ≥ ``z_threshold`` standard deviations
    from the population mean, most extreme first."""
    if z_threshold <= 0:
        raise ValueError("z_threshold must be positive")
    return (
        count_zscores(df, keys, count_col=count_col)
        .filter(F.abs(F.col("z")) >= z_threshold)
        .orderBy(F.abs(F.col("z")).desc(), *([keys] if isinstance(keys, str) else list(keys)))
    )


def manifest_count_outliers(store, run_id: str, z_threshold: float = 3.0, algo: str | None = None) -> DataFrame:
    """Outlier partitions of a STORED run, scored from manifest
    ``row_count`` alone (no corpus rescan).  Multi-algo runs carry one
    manifest row per algo with identical row_count — pass ``algo`` or
    the duplicated counts would narrow the variance."""
    snap = store.snapshot(run_id)
    if algo is not None:
        snap = snap.filter(F.col("algo") == algo)
    else:
        snap = snap.dropDuplicates(["partition_id"])
    return count_outliers(snap, "partition_id", z_threshold, count_col="row_count")
