"""Key-skew profiling — find the hot keys BEFORE a shuffle hits them.

Every skew mitigation in this engine (``constraints.salted_join``,
AQE skew-join, shrinking ``ranges.interval_join`` buckets) needs the
same input: which key values are hot, and by how much.  This operator
answers it with the one aggregation shape that is itself IMMUNE to the
skew it measures: a ``groupBy(keys).count()`` runs with map-side
partial aggregation, so a key with 10^9 rows contributes one partial
row per input partition — the reduce side only ever merges
(num_partitions × distinct_keys_per_partition) partials, never raw
rows.  Profiling a 100-TB table for skew is therefore a single safe
pass, unlike e.g. ``collect_list`` diagnostics.

Output per hot key: ``n`` (row count), ``share`` (fraction of all
rows), and ``hot_x`` (n divided by the mean rows-per-key — "this key is
37× average").  ``ceil(hot_x)`` is the natural ``n_salt`` to hand
``salted_join``.  Top-N selection is TakeOrderedAndProject (per-
partition heaps, no single-task global sort) with a deterministic
key tiebreak.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_profile(df: DataFrame, keys: str | Sequence[str], top_n: int = 20) -> DataFrame:
    """Top-``top_n`` hottest key values of ``df`` by row count:
    ``(*keys, n, share, hot_x)``, ordered by ``n`` desc with the key
    columns as deterministic tiebreak."""
    kcols = [keys] if isinstance(keys, str) else list(keys)
    if top_n <= 0:
        raise ValueError("top_n must be positive")
    clash = set(kcols) & {"n", "share", "hot_x"}
    if clash:
        raise ValueError(f"key columns collide with output names: {sorted(clash)}")
    counts = df.groupBy(*kcols).agg(F.count(F.lit(1)).alias("n"))
    # one tiny row: total rows + distinct keys — broadcast it onto the
    # top-N (a scalar join, not a shuffle)
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    top = counts.orderBy(F.desc("n"), *kcols).limit(top_n)
    return top.crossJoin(F.broadcast(totals)).select(
        *kcols,
        "n",
        F.round(F.col("n") / F.col("_total"), 6).alias("share"),
        F.round(F.col("n") * F.col("_n_keys") / F.col("_total"), 6).alias("hot_x"),
    )
