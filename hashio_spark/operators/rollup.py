"""Dataset-level digests and run metrics.

* :func:`ordered_digest` — the reference ``checksum_folder``
  (``/root/reference/lib/hashio/encoder.py:356-372``) folds every file's
  bytes through ONE running hash in walk order.  A sequential fold cannot
  parallelize, so the distributed analog is a two-level **tree hash**:
  digest of the ordered concatenation of per-item digests.  Equal inputs
  in equal order → equal digest; parallelism comes from level 1 being
  per-row.
* :func:`dataset_digest` — one digest for a whole table: tree-hash over
  the per-partition composite digests (sorted by partition_id), so the
  reduce input is n_partitions rows regardless of table size.
* :func:`observe_counters` — the reference's shared-memory progress
  counters (``worker.py:151-152,287-291``) as a ``df.observe`` metric
  set: row count + byte-size sum ride along with whatever action runs,
  zero extra passes.
* :func:`format_bytes` — B…PB pretty-printer
  (``utils.py:49-59``) for report rendering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from hashio_spark.functions.digests import digest_expr


def ordered_digest_expr(order_col: Column | str, hash_col: Column | str, algo: str = "md5") -> Column:
    """Aggregate: digest of per-item digests concatenated in order_col
    order (tree-hash level 2).  collect_list bounds: use per-partition,
    then :func:`dataset_digest` for the global level."""
    o = F.col(order_col) if isinstance(order_col, str) else order_col
    h = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    ordered = F.sort_array(F.collect_list(F.struct(o.alias("o"), h.cast("string").alias("h"))))
    return digest_expr(F.concat_ws("", F.transform(ordered, lambda x: x["h"])), algo)


def dataset_digest(report: DataFrame, algo: str = "md5",
                   partition_col: str = "partition_id", digest_col: str = "digest") -> DataFrame:
    """One-row DataFrame (dataset_digest string): tree hash over the
    per-partition digests in partition order."""
    return report.agg(ordered_digest_expr(partition_col, digest_col, algo).alias("dataset_digest"))


def observe_counters(df: DataFrame, name: str = "metrics", size_col: str | None = None):
    """Attach zero-cost progress counters; returns (df, Observation).
    Read ``obs.get`` after an action completes."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    if size_col is not None:
        metrics.append(F.sum(F.col(size_col)).alias("bytes"))
    return df.observe(obs, *metrics), obs


def run_summary(rows: int, size_bytes: int | None, seconds: float) -> dict:
    """Reference --summarize analog (cli.py:495-512)."""
    out = {
        "total_rows": rows,
        "total_time_sec": round(seconds, 3),
        "rows_per_sec": round(rows / seconds, 2) if seconds > 0 else None,
    }
    if size_bytes is not None:
        out["total_bytes"] = size_bytes
        out["pretty_bytes"] = format_bytes(size_bytes)
        out["mb_per_sec"] = round(size_bytes / 1e6 / seconds, 2) if seconds > 0 else None
    return out


def format_bytes(n: int) -> str:
    """B…PB formatting matching the reference's units (utils.py:49-59)."""
    value = float(n)
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(value) < 1024.0:
            return f"{value:.1f} {unit}"
        value /= 1024.0
    return f"{value:.1f} PB"
