"""As-of (point-in-time) join — for each left row, the most recent right
row at or before its timestamp, per key.

The reference engine has no such operator; it belongs to the
training-data/feature-pipeline tier this engine adds (point-in-time
correctness when attaching slowly-changing attributes — "the user's
latest purchase as of this click", "the asset's latest manifest entry as
of this validation run").

Spark has no ASOF JOIN builtin, and the naive formulation
(``l JOIN r ON key AND r.ts <= l.ts`` + keep-latest) explodes to
O(|l|·|r|) rows per key before the window prunes them.  This
implementation is the **union-timeline** plan instead:

* tag left rows side=1 and right rows side=0, union them into one
  timeline per key (right payload carried as a struct, NULL on left
  rows);
* one window per key ordered by ``(ts, side, payload)``:
  ``last(payload, ignoreNulls=True)`` over the unbounded-preceding
  prefix stamps every left row with the latest right payload at or
  before it — right rows sort before left rows at an equal timestamp,
  which is exactly inclusive-backward semantics;
* filter back to side=1 and unpack the struct.

Cost: ONE hash-partition shuffle on the key plus a per-key sort — no row
explosion, no broadcast requirement, and the window is key-partitioned so
there is no single-task global sort.  For ultra-hot keys (one key's
whole timeline in one task) use :func:`asof_join_bucketed`, which splits
the window across (key, time-bucket) partitions with a carry-forward
spine.

NULL timestamps: right rows with a NULL ``right_ts`` are dropped (SQL
semantics — ``NULL <= ts`` is never true, so they can match nothing);
left rows with a NULL ``left_ts`` survive with no match under
``how='left'`` and are dropped under ``'inner'``.

Determinism: when several right rows share a key and timestamp the
winner is the one with the greatest payload tuple (order the tie-break
column first in ``value_cols``); stage-retry-safe because the ordering
depends only on row content, never on partition layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS, _SIDE, _VAL, _M = "_asof_ts", "_asof_side", "_asof_val", "_asof_match"
_BKT = "_asof_bucket"


def _normalize_keys(left, left_on, right_on, value_cols, prefix, how, *, bucketed):
    """Shared arg validation; returns (lkeys, rkeys)."""
    lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
    rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
    if len(lkeys) != len(rkeys):
        raise ValueError("left_on and right_on must have the same length")
    if how not in ("left", "inner"):
        raise ValueError(f"unknown how: {how}")
    internals = {_TS, _SIDE, _VAL, _M} | ({_BKT} if bucketed else set())
    clash = set(left.columns) & internals
    if clash:
        raise ValueError(f"left columns collide with internals: {sorted(clash)}")
    out_clash = set(left.columns) & {f"{prefix}{c}" for c in value_cols}
    if out_clash:
        raise ValueError(
            f"left columns collide with matched output names: {sorted(out_clash)}"
            " — pass a different prefix"
        )
    return lkeys, rkeys


def _right_side(right, rkeys, lkeys, right_ts, value_cols):
    """Right rows as timeline rows; NULL-ts rows can match nothing and
    are dropped here (they would otherwise sort as -infinity)."""
    return right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(rk).alias(lk) for rk, lk in zip(rkeys, lkeys)],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in value_cols]).alias(_VAL),
    )


def _unpack(stamped, left, value_cols, prefix, how):
    out = stamped.filter(F.col(_SIDE) == 1)
    if how == "inner":
        out = out.filter(F.col(_M).isNotNull())
    return out.select(
        *left.columns,
        *[F.col(f"{_M}.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str | Sequence[str],
    right_on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    *,
    direction: str = "backward",
    how: str = "left",
    prefix: str = "asof_",
) -> DataFrame:
    """Stamp each ``left`` row with ``value_cols`` from the latest
    ``right`` row whose ``right_ts`` <= the row's ``left_ts`` (inclusive)
    for the same join key.

    ``direction='forward'`` matches the EARLIEST right row at-or-after
    instead.  ``how='inner'`` drops left rows with no match; ``'left'``
    keeps them with NULL values.  Matched columns come back as
    ``{prefix}{col}``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    lkeys, rkeys = _normalize_keys(
        left, left_on, right_on, value_cols, prefix, how, bucketed=False
    )

    r = _right_side(right, rkeys, lkeys, right_ts, value_cols)
    l = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    timeline = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_VAL).asc()]
    else:  # forward: earliest at-or-after == latest in reverse time order
        order = [F.col(_TS).desc(), F.col(_SIDE).asc(), F.col(_VAL).asc()]
    w = (
        Window.partitionBy(*lkeys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stamped = timeline.withColumn(_M, F.last(_VAL, ignorenulls=True).over(w))
    return _unpack(stamped, left, value_cols, prefix, how)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_on: str | Sequence[str],
    right_on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    *,
    bucket_width: float,
    how: str = "left",
    prefix: str = "asof_",
) -> DataFrame:
    """Hot-key-hardened :func:`asof_join` (backward/inclusive): identical
    output, but the timeline window partitions on ``(key, time_bucket)``
    instead of the key alone, so one ultra-hot key's history no longer
    sorts in a single task.

    Mechanics — the carry-forward pattern for splitting a prefix scan:

    1. bucket both sides by ``floor(ts / bucket_width)``;
    2. per (key, bucket) reduce the right side to its last payload — a
       map-side-combining aggregate, output rows = active (key, bucket)
       pairs, tiny relative to the data;
    3. over the per-key bucket SPINE (every bucket either side touches),
       carry each bucket's opening payload = the latest right payload in
       any EARLIER bucket (one window over the tiny spine);
    4. inject each bucket's carry as a synthetic row that sorts before
       everything in the bucket, then run the usual union-timeline window
       partitioned by (key, bucket).

    The data-sized shuffle partitions by (key, bucket): a key hot enough
    to skew now spreads across its active buckets.  Pick ``bucket_width``
    so one bucket of the hottest key fits a task (e.g. a day of events).
    Costs one extra tiny aggregate + spine window over the plain variant;
    for non-skewed keys prefer :func:`asof_join`.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    lkeys, rkeys = _normalize_keys(
        left, left_on, right_on, value_cols, prefix, how, bucketed=True
    )

    def bucket_of(ts_col: str) -> F.Column:
        return F.floor(F.col(ts_col).cast("double") / F.lit(float(bucket_width))).cast("long")

    r = _right_side(right, rkeys, lkeys, right_ts, value_cols).withColumn(
        _BKT, bucket_of(_TS)
    )
    l = (
        left.withColumn(_TS, F.col(left_ts))
        .withColumn(_BKT, bucket_of(left_ts))
        .withColumn(_SIDE, F.lit(1))
    )

    # (2) last right payload per (key, bucket): max of (ts, payload) —
    # struct ordering gives latest ts, ties to greatest payload, matching
    # the plain variant's tie-break
    last_in_bucket = r.groupBy(*lkeys, _BKT).agg(
        F.max(F.struct(F.col(_TS), F.col(_VAL))).alias("_last")
    )
    # (3) spine of every active (key, bucket) on either side, opening
    # carry = latest _last of any strictly-earlier bucket
    spine = (
        l.select(*lkeys, _BKT)
        .unionByName(r.select(*lkeys, _BKT))
        .distinct()
        .join(last_in_bucket, [*lkeys, _BKT], "left_outer")
    )
    wc = (
        Window.partitionBy(*lkeys)
        .orderBy(_BKT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = (
        spine.withColumn("_carry", F.max("_last").over(wc))
        .filter(F.col("_carry").isNotNull())
        .select(
            *lkeys,
            F.col(_BKT),
            F.col("_carry._asof_ts").alias(_TS),
            F.lit(-1).alias(_SIDE),
            F.col(f"_carry.{_VAL}").alias(_VAL),
        )
    )

    # (4) union-timeline per (key, bucket); the carry's real ts is from an
    # earlier bucket so it sorts first naturally, and side -1 keeps it
    # before any same-ts in-bucket right row (cannot happen — earlier
    # bucket implies smaller ts — but belt and braces)
    timeline = l.unionByName(r, allowMissingColumns=True).unionByName(
        carries, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(*lkeys, _BKT)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_VAL).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stamped = timeline.withColumn(_M, F.last(_VAL, ignorenulls=True).over(w))
    return _unpack(stamped, left, value_cols, prefix, how)
