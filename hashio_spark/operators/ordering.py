"""Deterministic training-order shuffle + quantile-based quality gates.

Training runs need the corpus in a reproducible pseudo-random order,
sharded so each data-loader rank reads its own slice.  A global
``orderBy(rand())`` is both nondeterministic (seed interacts with
partition layout) and a single total sort of the corpus — the classic
100-TB cliff.  The standard fix (public Spark folklore, same trick as
our hash-gate sampling) is a HASH shuffle: order by ``hash(key, seed)``.
Sharding first means the required sort is per-shard, not global:

* ``shard = pmod(hash(key, seed), n_shards)`` — a pure per-row
  projection, no shuffle;
* ``pos = row_number() OVER (PARTITION BY shard ORDER BY hash, key)``
  — one hash-partition exchange on ``shard`` plus a per-shard sort of
  ``n/n_shards`` rows.  At 10^12 rows pick ``n_shards`` so a shard fits
  a task (e.g. 2^17 shards → ~7.6M rows each); the exchange is the only
  corpus-wide data movement and it is the SAME partitioning the shard
  writer needs next, so the sort output streams straight into
  per-shard files with no further shuffle.

Hash tiers match the sampling module: ``xxhash64`` (native, scale) and
``md5`` (bit-replicable in any SQL engine — the oracle twin).

The quantile gate is the other curation primitive: "keep the best K%
of each source by quality score".  Two tiers:

* ``quantile_gate`` — EXACT: ``percent_rank()`` per group, integer
  rank arithmetic, deterministic tiebreak — engine-portable, but costs
  a per-group sort (fine when groups are bounded, e.g. sources);
* ``quantile_gate_approx`` — SCALE: one ``approx_percentile`` pass
  computes a per-group threshold (map-side-combined sketch agg, tiny
  result), broadcast back as a per-row filter — no sort of the corpus
  at any scale, at the cost of sketch error on the cut line.

Reference parity: the reference has no ordering/curation stage (it
hashes whatever the walk yields, ``lib/hashio/worker.py``); these are
the training-pipeline generalizations the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hashio_spark.operators.sampling import hash_long, hash_uniform


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int = 64,
    seed: str = "s42",
    method: str = "xxhash64",
) -> DataFrame:
    """Assign each row a deterministic (shard, pos) training-order slot.

    Layout-independent: the slot depends only on (key, seed, n_shards),
    so re-running after a repartition/compaction yields the identical
    order.  Raising ``n_shards`` re-buckets but keeps the within-shard
    relative order of surviving co-residents (both derive from the same
    hash).  Output: input columns + ``shard`` (int) + ``pos`` (1-based
    within shard).

    ``pos`` orders by the FULL-width hash (r4 ADVICE): the mod-1e6
    residue that assigns shards has ~rows/1e6 collisions per value, so at
    10^12 rows ordering by it would collapse within-shard order to the
    key tiebreak — long key-sequential runs in the supposedly
    pseudo-random training order.  The residue keeps shard assignment
    (and the md5 oracle tier) unchanged; only the within-shard sort key
    widened.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    u = hash_uniform(key_col, seed=seed, method=method)
    # round() (not floor) recovers the exact integer hash residue from
    # u = k/1e6 — the double round-trip can land an ulp below k.
    with_u = df.withColumn("_u", u).withColumn(
        "shard", F.pmod(F.round(F.col("_u") * F.lit(1_000_000)).cast("long"), F.lit(n_shards)).cast("int")
    ).withColumn("_h", hash_long(key_col, seed=seed, method=method))
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(key_col))
    return with_u.withColumn("pos", F.row_number().over(w)).drop("_u", "_h")


def quantile_gate(
    df: DataFrame,
    score_col: str,
    group_col: str,
    keep_frac: float,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """EXACT per-group quality gate: keep the top ``keep_frac`` of each
    group by ``score_col``.

    Uses ``percent_rank`` (integer rank arithmetic — no float quantile
    interpolation, so the kept set is bit-identical across engines) with
    a deterministic tiebreak.  A row is kept iff its percent_rank over
    ascending score is >= 1 - keep_frac, OR it is its group's only row:
    percent_rank of a singleton is 0.0, which never clears the bar for
    keep_frac < 1, so without the OR 'keep the top 50% of each source'
    would silently discard every single-row source (r4 ADVICE).  Costs
    one exchange on ``group_col`` + a per-group sort — use the approx
    tier when groups are corpus-sized.
    """
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    order = [F.col(score_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    # count() reuses the SAME partitioning as the rank window — no extra
    # exchange, one extra unordered-window pass
    n_in_group = F.count(F.lit(1)).over(Window.partitionBy(group_col))
    return df.withColumn("_pr", F.percent_rank().over(w)).withColumn(
        "kept", (F.col("_pr") >= F.lit(1.0 - keep_frac)) | (n_in_group == 1)
    ).drop("_pr")


def quantile_gate_approx(
    df: DataFrame,
    score_col: str,
    group_col: str,
    keep_frac: float,
    accuracy: int = 10_000,
) -> DataFrame:
    """SCALE tier: per-group threshold via ``approx_percentile`` (one
    map-combined sketch aggregate, groups-sized result), broadcast back
    as a per-row ``score >= threshold`` filter.  No per-group sort of
    the corpus; threshold error bounded by the sketch ``accuracy``."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    thresholds = df.groupBy(group_col).agg(
        F.expr(
            f"approx_percentile({score_col}, {1.0 - keep_frac}, {accuracy})"
        ).alias("_thresh")
    )
    joined = df.join(F.broadcast(thresholds), group_col, "left")
    return joined.withColumn(
        "kept", F.col(score_col) >= F.coalesce(F.col("_thresh"), F.lit(float("-inf")))
    ).drop("_thresh")
