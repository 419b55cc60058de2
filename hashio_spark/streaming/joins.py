"""Watermarked stream-stream attribution join — point-in-window, live.

The batch engine answers "which clicks landed inside a signup's
attribution window" with the bucketed interval join
(``operators/ranges.py``).  The STREAMING answer must bound its state:
Spark only drops buffered rows from a stream-stream join when the join
condition gives it time bounds on both sides plus watermarks.  This
operator therefore takes the window as ``start + span`` (a fixed span,
not an arbitrary end column): the condition
``p.ts >= i.start AND p.ts < i.start + span`` tells Spark a point can
stop waiting for intervals older than ``span`` and an interval can be
evicted once the point watermark passes its window end — state is
O(rate × (span + watermark)), not unbounded.

The same function runs unchanged on batch DataFrames (``withWatermark``
is a no-op there), which is how the test proves streaming results equal
the batch ``interval_join`` on identical input.

Semantics match ``operators/ranges.interval_join``: start-inclusive,
end-exclusive, NULL timestamps match nothing, ``how='inner'`` or
``'left_semi'`` (the two stream-stream modes that need no outer-null
emission).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SPAN_RE = re.compile(r"^\d+\s+[A-Za-z]+$")


def attribution_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    span: str,
    left_on: str | Sequence[str],
    right_on: str | Sequence[str],
    value_cols: Sequence[str] = (),
    watermark: str = "10 minutes",
    prefix: str = "ivl_",
    how: str = "inner",
) -> DataFrame:
    """Join each point to the intervals ``[start, start + span)``
    containing it, matching equi-keys ``left_on``/``right_on``.

    ``span``/``watermark`` are SQL interval strings (``"24 hours"``).
    Keys are REQUIRED: a keyless stream-stream join buffers every row
    against every row; if you really mean that, add a constant key
    column explicitly.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"unknown how: {how} (streaming supports inner/left_semi)")
    if not _SPAN_RE.match(span.strip()):
        raise ValueError(f"span must look like '24 hours', got: {span!r}")
    lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
    rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
    if not lkeys or len(lkeys) != len(rkeys):
        raise ValueError("left_on and right_on must be non-empty and the same length")
    if how == "inner":
        clash = set(points.columns) & {f"{prefix}{c}" for c in value_cols}
        if clash:
            raise ValueError(
                f"point columns collide with matched output names: {sorted(clash)}"
                " — pass a different prefix"
            )

    p = points.withWatermark(point_ts, watermark)
    r = intervals.select(
        *[F.col(rk).alias(f"_ivw_k{i}") for i, rk in enumerate(rkeys)],
        F.col(start_ts).alias("_ivw_start"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_ivw_val"),
    ).withColumn("_ivw_end", F.col("_ivw_start") + F.expr(f"INTERVAL {span}"))
    r = r.withWatermark("_ivw_start", watermark)

    cond = (p[point_ts] >= r["_ivw_start"]) & (p[point_ts] < r["_ivw_end"])
    for i, lk in enumerate(lkeys):
        cond = cond & (p[lk] == r[f"_ivw_k{i}"])

    joined = p.join(r, cond, how)
    if how == "left_semi":
        return joined.select(*points.columns)
    return joined.select(
        *[p[c] for c in points.columns],
        *[F.col(f"_ivw_val.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )
