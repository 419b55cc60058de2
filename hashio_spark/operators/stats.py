"""Per-partition column statistics — one shuffle, map-side partials.

The stats pass generalizes the reference's metadata projection + progress
counters (``/root/reference/lib/hashio/utils.py:107-126``,
``worker.py:151-152,287-291``) into a single ``groupBy(partition_id)``
aggregation: count / nulls / min / max / HLL-distinct per column plus the
group digests.  Every aggregate here is algebraic → Spark computes
map-side partials before the shuffle, so network traffic is
O(partitions × columns), independent of row count: the property that
makes the pass viable at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stat_aggs(
    columns: list[str],
    hll_rsd: float = 0.05,
    skip_minmax: frozenset[str] = frozenset(),
) -> list[Column]:
    """count/null-count/min/max/approx-distinct aggregate expressions.

    ``skip_minmax`` names columns whose min/max should be EXCLUDED here and
    computed elsewhere (see :func:`minmax_aggs`).  Rationale: ``min``/``max``
    over a non-primitive buffer type (StringType etc.) is a declarative
    aggregate with an immutable buffer field, which disqualifies the whole
    aggregation from ``HashAggregateExec`` — Spark silently degrades to
    ``SortAggregate``, i.e. a per-task sort of the *input* rows.  When the
    aggregation runs over a wide projection (the flagship's enriched table
    carries the full ``spans`` payload) that sort moves every byte of every
    row, for two string stats.  Splitting string min/max into a
    column-pruned side aggregation keeps the wide aggregation a
    HashAggregate with map-side partials.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("row_count")]
    for c in columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"))
        if c not in skip_minmax:
            aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
        aggs.append(F.approx_count_distinct(c, hll_rsd).alias(f"{c}_approx_distinct"))
    return aggs


def minmax_aggs(columns: list[str]) -> list[Column]:
    """min/max aggregate expressions for columns deferred via
    ``skip_minmax`` — run these over a pruned (group_col, *columns)
    projection where the inevitable SortAggregate sorts narrow rows."""
    aggs: list[Column] = []
    for c in columns:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return aggs


def column_stats(df: DataFrame, columns: list[str], group_col: str = "partition_id") -> DataFrame:
    """Per-group stats DataFrame, one row per group."""
    return df.groupBy(group_col).agg(*stat_aggs(columns))
