"""Mergeable HLL distinct-count sketches riding the manifest store.

``approx_count_distinct`` (operators/stats.py) answers "how many distinct
doc_ids in THIS run" — but its HLL++ buffer dies with the query.  At
10^12 rows the questions that matter later ("how many distinct doc_ids
across runs A and B?", "did the March snapshot add any new documents?")
must not cost a corpus rescan.  The fix is the classic sketch-mergeability
property: store one serialized Apache DataSketches HLL per (run,
partition) in the manifest's stats map, and answer every later distinct
query by unioning kilobyte sketches — O(runs × partitions) manifest rows,
zero document reads.  This is the distinct-count analog of the stored
quality histogram that backs ``operators.drift.manifest_drift``.

Spark side: `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`
are JVM builtins (Spark 3.5+); sketches travel base64-in-the-stats-map so
the manifest schema (map<string,string>) is unchanged.  Union is
commutative/associative → map-side partials everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKETCH_KEY = "doc_id_hll"


def hll_sketch_expr(col: str, lg_k: int = 12) -> F.Column:
    """Base64-serialized HLL sketch of ``col`` — aggregate expression for
    a groupBy; ~1.6% relative error at lg_k=12, a few KB each."""
    return F.base64(F.hll_sketch_agg(F.col(col), lg_k))


def merged_distinct(
    manifests: DataFrame,
    by: tuple[str, ...] = (),
    stat_key: str = SKETCH_KEY,
) -> DataFrame:
    """Distinct-count estimate from STORED manifest rows alone.

    ``manifests`` is a ManifestStore.read() result whose stats map
    carries ``stat_key`` (written by ``validate(with_sketches=True)``).
    ``by=()`` gives one global row (distinct across every run/partition
    present — overlaps between runs are handled correctly by the HLL
    union, unlike summing per-run counts); ``by=("run_id",)`` one row per
    run.  Rows lacking the sketch (older engine versions) are dropped —
    same contract as ``manifest_drift`` for missing histograms.
    """
    s = manifests.filter(
        F.map_contains_key(F.col("stats"), F.lit(stat_key))
    ).select(
        *by, F.unbase64(F.element_at(F.col("stats"), F.lit(stat_key))).alias("_sk")
    )
    agg = F.round(F.hll_sketch_estimate(F.hll_union_agg(F.col("_sk"))), 0).cast(
        "long"
    ).alias("distinct_estimate")
    if by:
        return s.groupBy(*by).agg(agg)
    return s.agg(agg)
