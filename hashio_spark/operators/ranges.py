"""Bucketed range (interval) join — points against [start, end) windows.

The validation engine keeps needing "is this event inside any window?"
joins: media_refs valid only within license windows, events inside
maintenance windows, clicks within an attribution window of a signup.
Spark has no native range-join optimization — a plain
``points.join(intervals, ts >= start & ts < end)`` has no equi-key, so
Catalyst plans a BroadcastNestedLoopJoin (or a CartesianProduct): every
point compared against every interval, O(n·m) — the classic 100-TB
cliff.

The fix is the standard bin/chunk range join (the same technique behind
Databricks' range-join hint, public docs): pick a ``bucket_width`` on
the time axis, explode each interval into the buckets it overlaps,
bucket each point (exactly one bucket per point), and equi-join on
(key…, bucket) with the exact containment predicate as a residual
filter.  That is ONE hash-partition shuffle; per-pair work is bounded
by bucket co-residents, not the whole table.  Because a point lives in
exactly one bucket, a (point, interval) pair can only meet once — no
post-join dedup is needed.

Choosing ``bucket_width``: the interval side grows by a factor of
``avg_interval_span / bucket_width`` rows, and a bucket must fit its
co-resident points + interval replicas in one task — pick a width near
the TYPICAL interval length.  A width far below the longest interval
explodes that interval into many rows (bounded blowup, still correct);
a width far above it piles unrelated rows into one bucket (one
oversized task).  For open-ended or pathologically long intervals,
split them upstream.  With no equi-key the join hashes on the bucket
alone; heavily-overlapped hot buckets then skew — profile with
``operators.skew.key_profile`` and shrink the width or add a key.

Semantics: start-inclusive, end-exclusive ([start, end)).  Rows with a
NULL timestamp or NULL bounds can match nothing (SQL comparison
semantics); under ``how='left_anti'`` a NULL-ts point is therefore KEPT
(it is inside no window).  Intervals with ``end <= start`` are empty
and dropped.

Beyond-reference operator (the reference's verify loop has no temporal
join); it generalizes the union-timeline as-of join
(``operators/asof.py``) from "latest at-or-before" to full interval
containment.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

_S, _E, _B, _V = "_ivl_start", "_ivl_end", "_ivl_bucket", "_ivl_val"


def _axis_as_double(df: DataFrame, colname: str) -> F.Column:
    """The bucketing axis as a double: epoch seconds (with fraction) for
    timestamp/date columns, plain cast for numerics.  TIMESTAMP_NTZ has
    no direct double cast in Spark 4 — route through timestamp_ltz;
    the session-timezone shift is the same monotone offset on both
    sides, so bucket assignment stays consistent."""
    dt = df.schema[colname].dataType
    c = F.col(colname)
    if isinstance(dt, (TimestampNTZType, TimestampType, DateType)):
        c = c.cast("timestamp_ltz")
    return c.cast("double")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    value_cols: Sequence[str] = (),
    *,
    left_on: str | Sequence[str] | None = None,
    right_on: str | Sequence[str] | None = None,
    bucket_width: float = 3600.0,
    how: str = "inner",
    prefix: str = "ivl_",
) -> DataFrame:
    """Join ``points`` to every interval of ``intervals`` containing its
    ``point_ts`` (``start_ts <= ts < end_ts``), optionally also matching
    equi-keys ``left_on``/``right_on``.

    ``how='inner'`` emits one row per (point, containing interval) pair:
    all point columns plus ``{prefix}{col}`` for each of ``value_cols``.
    ``how='left_semi'`` / ``'left_anti'`` emit the point rows that fall
    inside at least one / no interval (point columns only).

    ``bucket_width`` is in the units of ``cast(ts as double)`` — seconds
    for timestamps.
    """
    if how not in ("inner", "left_semi", "left_anti"):
        raise ValueError(f"unknown how: {how}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if left_on is None:
        lkeys: list[str] = []
    else:
        lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
    if right_on is None:
        rkeys: list[str] = []
    else:
        rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
    if len(lkeys) != len(rkeys):
        raise ValueError("left_on and right_on must have the same length")
    clash = set(points.columns) & {_B}
    if clash:
        raise ValueError(f"point columns collide with internals: {sorted(clash)}")
    if how == "inner":
        out_clash = set(points.columns) & {f"{prefix}{c}" for c in value_cols}
        if out_clash:
            raise ValueError(
                f"point columns collide with matched output names: {sorted(out_clash)}"
                " — pass a different prefix"
            )

    w = float(bucket_width)

    # interval side: drop unmatched-able rows, replicate across overlapped
    # buckets.  Last bucket via ceil(end/w)-1 keeps end EXCLUSIVE: an end
    # exactly on a bucket boundary k*w does not reach into bucket k.
    r = intervals.filter(
        F.col(start_ts).isNotNull()
        & F.col(end_ts).isNotNull()
        & (F.col(end_ts) > F.col(start_ts))
    ).select(
        *[F.col(rk).alias(f"_ivl_k{i}") for i, rk in enumerate(rkeys)],
        (F.floor(_axis_as_double(intervals, start_ts) / F.lit(w))).cast("long").alias("_ivl_b0"),
        (F.ceil(_axis_as_double(intervals, end_ts) / F.lit(w)) - 1).cast("long").alias("_ivl_b1"),
        F.col(start_ts).alias(_S),
        F.col(end_ts).alias(_E),
        F.struct(*[F.col(c) for c in value_cols]).alias(_V),
    )
    r = r.withColumn(_B, F.explode(F.sequence(F.col("_ivl_b0"), F.col("_ivl_b1"))))

    p = points.withColumn(
        _B, F.floor(_axis_as_double(points, point_ts) / F.lit(w)).cast("long")
    )
    cond = p[_B] == r[_B]
    for i, lk in enumerate(lkeys):
        cond = cond & (p[lk] == r[f"_ivl_k{i}"])
    cond = cond & (p[point_ts] >= r[_S]) & (p[point_ts] < r[_E])

    joined = p.join(r, cond, how)
    if how in ("left_semi", "left_anti"):
        return joined.select(*points.columns)
    return joined.select(
        *[p[c] for c in points.columns],
        *[F.col(f"{_V}.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )
