"""Data-layout planning: small-file compaction + Z-order clustering keys.

At 100 TB an Iceberg table's health is a layout problem as much as a
content problem: thousands of small files per partition destroy scan
throughput (per-file open cost, tiny row groups, no effective min/max
pruning), and single-column sort orders only prune one query dimension.
These operators plan the two standard maintenance actions FROM MANIFEST
METADATA — the corpus itself is never scanned:

* :func:`compaction_plan` — next-fit bin packing of partitions/files
  into target-sized rewrite groups (what Iceberg's
  ``rewrite_data_files`` binpack strategy decides before it runs).
  Input is manifest-sized (one row per partition/file, 10^5–10^6 rows
  for a 100-TB table), so the ordering window is metadata-cheap; the
  expensive part — the rewrite itself — executes as one job per group
  with every group ≈ target bytes, i.e. uniform task sizing by
  construction.
* :func:`zvalue_expr` / :func:`cluster_by_zorder` — multi-dimension
  layout clustering: bit-interleave two bucketed dimensions into one
  Z-value, range-partition + sort the write by it, and parquet/Iceberg
  min-max stats then prune scans filtered on EITHER dimension (a plain
  sort order prunes only its leading column).  The Z-value is a pure
  per-row integer expression (16 shift/mask terms, fully codegen'd,
  engine-portable — no UDF).

Reference lineage: the reference has no layout planner (its unit of
work is the filesystem walk, ``/root/reference/lib/hashio/utils.py:152-209``);
these are the Spark/Iceberg-native operations that role needs at table
scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    parts: DataFrame,
    key_col: str,
    size_col: str,
    target_size: int,
) -> DataFrame:
    """Assign each partition/file to a rewrite group of ≈ ``target_size``.

    Next-fit in key order: ``file_group = floor(cum_bytes_before / target)``.
    Key order is preserved inside every group, so a sorted table keeps
    range-metadata locality after compaction (group N's key range ends
    where group N+1's begins).  Oversized inputs (> target) get a group
    of their own plus whatever next-fit placed before them — exactly how
    binpack rewrite treats already-big files.

    Input contract: ``parts`` is MANIFEST-sized (one row per
    partition/file), so the global ordering window is cheap; this is a
    planning operator, never pointed at row-level data.

    Returns (key_col, size_col, file_group, group_bytes, group_files).
    """
    w_cum = Window.orderBy(key_col).rowsBetween(Window.unboundedPreceding, -1)
    assigned = parts.withColumn(
        "file_group",
        F.floor(
            F.coalesce(F.sum(F.col(size_col)).over(w_cum), F.lit(0))
            / F.lit(int(target_size))
        ).cast("long"),
    )
    w_grp = Window.partitionBy("file_group")
    return assigned.select(
        key_col,
        size_col,
        "file_group",
        F.sum(F.col(size_col)).over(w_grp).alias("group_bytes"),
        F.count(F.lit(1)).over(w_grp).alias("group_files"),
    )


def zvalue_expr(a: Column, b: Column, bits: int = 8) -> Column:
    """Bit-interleave two ``bits``-bit non-negative ints into a Z-value.

    Bit ``i`` of ``a`` lands at position ``2i``, bit ``i`` of ``b`` at
    ``2i+1`` — the Morton curve.  Pure shift/mask/sum expression: whole
    stage codegen compiles it to straight-line long arithmetic, and the
    identical arithmetic runs in any SQL engine (the oracle twin).
    Callers bucket raw dimensions into [0, 2^bits) first.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def cluster_by_zorder(df: DataFrame, z_col: str, n_partitions: int) -> DataFrame:
    """Range-partition on the Z-value and sort inside each partition —
    the write-side layout step.  Every output file then covers a compact
    Z-range, i.e. a small rectangle in (dim_a, dim_b) space, so min/max
    footer stats prune scans filtered on either dimension.  Range
    partitioning samples the Z distribution (Spark's RangePartitioner),
    which absorbs dimension skew without a custom partitioner."""
    return df.repartitionByRange(n_partitions, F.col(z_col)).sortWithinPartitions(z_col)
