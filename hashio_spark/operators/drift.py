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
    # global (unpartitioned) window — intentional: by this point the input
    # is POST-aggregation, exactly n_buckets rows regardless of corpus
    # size, so the single-partition CDF scan is O(n_buckets), not a
    # scale hazard (source of the benign WindowExec warning in logs)
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


def hist_string_agg(col: str, lo: float, hi: float, n_buckets: int = 20) -> F.Column:
    """Aggregate expression: fixed-width histogram of ``col`` serialized
    as a comma-joined count string ("c0,c1,...").  Emitted into the
    validation report so it rides into the manifest's ``stats`` map —
    the stored-baseline half of the north rule's "drift checks against a
    stored baseline manifest" (see :func:`manifest_drift`)."""
    b = bucket_expr(col, lo, hi, n_buckets)
    counts = [
        F.sum(F.when(F.col(col).isNotNull() & (b == i), 1).otherwise(0)).cast("string")
        for i in range(n_buckets)
    ]
    return F.concat_ws(",", *counts)


def psi_from_hist_pair() -> F.Column:
    """PSI expression over two BOUND array<double> columns ``_ha``/``_hb``
    with bound totals ``_ta``/``_tb`` (stage them in a projection first —
    BENCH.md finding #7).  ε-smoothing matches :func:`psi`."""
    eps = F.lit(1e-6)
    p = F.zip_with(F.col("_ha"), F.col("_hb"), lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    term = F.transform(
        p,
        lambda s: (s["a"] / F.col("_ta") + eps - (s["b"] / F.col("_tb") + eps))
        * F.log((s["a"] / F.col("_ta") + eps) / (s["b"] / F.col("_tb") + eps)),
    )
    return F.aggregate(term, F.lit(0.0), lambda acc, x: acc + x)


def manifest_drift(
    store,
    run_a: str,
    run_b: str,
    hist_key: str = "quality_hist",
    threshold: float = 0.25,
) -> DataFrame:
    """Per-partition PSI between two STORED runs' quality histograms —
    the full stored-baseline drift loop: ``validate()`` emits the
    histogram → ``manifest_rows`` lands it in the manifest stats map →
    this compares two snapshots without touching the document table at
    all (manifest-sized work, independent of corpus size).

    Returns (partition_id, psi, drifted).  Partitions missing the
    histogram in either run are dropped (older manifests predating the
    histogram column); so are partitions whose two histograms have
    different bucket counts (manifests written by different engine
    versions) — ``zip_with`` would null-pad the shorter side, the PSI
    would aggregate to NULL, and consumers formatting ``psi``/``drifted``
    would crash on the null."""
    a = store.snapshot(run_a).select("partition_id", F.col("stats")[hist_key].alias("_sa"))
    b = store.snapshot(run_b).select("partition_id", F.col("stats")[hist_key].alias("_sb"))
    j = (
        a.join(b, "partition_id")
        .filter(F.col("_sa").isNotNull() & F.col("_sb").isNotNull())
        .select(
            "partition_id",
            F.transform(F.split("_sa", ","), lambda x: x.cast("double")).alias("_ha"),
            F.transform(F.split("_sb", ","), lambda x: x.cast("double")).alias("_hb"),
        )
        .select(
            "partition_id",
            "_ha",
            "_hb",
            F.aggregate(F.col("_ha"), F.lit(0.0), lambda acc, x: acc + x).alias("_ta"),
            F.aggregate(F.col("_hb"), F.lit(0.0), lambda acc, x: acc + x).alias("_tb"),
        )
        .filter((F.col("_ta") > 0) & (F.col("_tb") > 0))
        .filter(F.size("_ha") == F.size("_hb"))
    )
    return (
        j.select(
            "partition_id",
            psi_from_hist_pair().alias("psi"),
        )
        .filter(F.col("psi").isNotNull())
        .withColumn("drifted", F.col("psi") > threshold)
    )


def drift_timeseries(
    store,
    runs: list[str] | None = None,
    hist_key: str = "quality_hist",
    threshold: float = 0.25,
) -> DataFrame:
    """Drift TREND across a store's run history: per consecutive run
    pair, the count of drifted partitions and the max/mean PSI — the
    monitoring view that turns :func:`manifest_drift`'s pairwise check
    into a time series (is the corpus drifting steadily, or did one
    ingest batch jump?).

    ``runs`` defaults to the store's runs ordered by their max
    ``updated_at`` (ingest order, not lexical run-id order).  All work is
    manifest-sized — the document corpus is never read; at 10^12 docs the
    manifest is O(runs × partitions) rows, and the consecutive-pair PSI
    reuses :func:`manifest_drift`'s null/width guards.

    Returns (run_a, run_b, n_partitions, n_drifted, max_psi, mean_psi)
    with one row per consecutive pair, in chronological order."""
    if runs is None:
        ordered = (
            store.read()
            .groupBy("run_id")
            .agg(F.max("updated_at").alias("_t"))
            .orderBy("_t", "run_id")
            .collect()
        )
        runs = [r.run_id for r in ordered]
    frames = []
    for run_a, run_b in zip(runs, runs[1:]):
        d = manifest_drift(store, run_a, run_b, hist_key=hist_key, threshold=threshold)
        frames.append(
            d.agg(
                F.count(F.lit(1)).alias("n_partitions"),
                F.sum(F.col("drifted").cast("long")).alias("n_drifted"),
                F.round(F.max("psi"), 6).alias("max_psi"),
                F.round(F.avg("psi"), 6).alias("mean_psi"),
            ).select(
                F.lit(run_a).alias("run_a"), F.lit(run_b).alias("run_b"),
                "n_partitions", "n_drifted", "max_psi", "mean_psi",
            )
        )
    if not frames:
        spark = store.spark
        return spark.createDataFrame(
            [],
            "run_a string, run_b string, n_partitions long, n_drifted long, "
            "max_psi double, mean_psi double",
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
