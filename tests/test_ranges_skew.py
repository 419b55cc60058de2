"""Bucketed interval join (operators/ranges.py) and key-skew profiling
(operators/skew.py)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hashio_spark.operators.ranges import interval_join
from hashio_spark.operators.skew import key_profile


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        ("p0", "u1", _ts(0, 30)),     # inside w1
        ("p1", "u1", _ts(1, 0)),      # exactly at w1 end -> excluded (end-exclusive)
        ("p2", "u1", _ts(0, 0)),      # exactly at w1 start -> included
        ("p3", "u2", _ts(0, 30)),     # right key, inside u2's window
        ("p4", "u1", _ts(5, 0)),      # inside no window
        ("p5", "u1", None),           # NULL ts -> matches nothing
        ("p6", "u3", _ts(0, 30)),     # key with no windows
        ("p7", "u1", _ts(2, 15)),     # inside both w1b windows (overlap)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["pid", "user", "ts"])
    )


@pytest.fixture(scope="module")
def windows(spark):
    rows = [
        ("w1", "u1", _ts(0, 0), _ts(1, 0)),
        ("w2", "u2", _ts(0, 0), _ts(1, 0)),
        ("w3", "u1", _ts(2, 0), _ts(3, 0)),
        ("w4", "u1", _ts(2, 10), _ts(2, 20)),   # overlaps w3
        ("w5", "u1", _ts(4, 0), _ts(4, 0)),     # empty interval, dropped
        ("w6", "u1", None, _ts(9, 0)),          # NULL bound, dropped
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["wid", "wuser", "start", "end"])
    )


def _oracle_pairs(points, windows):
    """Driver-side nested-loop oracle over the same rows."""
    ps = points.collect()
    ws = windows.collect()
    out = set()
    for p in ps:
        if p["ts"] is None:
            continue
        for w in ws:
            if w["start"] is None or w["end"] is None or w["end"] <= w["start"]:
                continue
            if p["user"] == w["wuser"] and w["start"] <= p["ts"] < w["end"]:
                out.add((p["pid"], w["wid"]))
    return out


@pytest.mark.parametrize("width", [600.0, 3600.0, 86400.0])
def test_inner_matches_nested_loop_oracle_any_width(points, windows, width):
    got = {
        (r["pid"], r["m_wid"])
        for r in interval_join(
            points, windows, "ts", "start", "end", ["wid"],
            left_on="user", right_on="wuser",
            bucket_width=width, prefix="m_",
        ).collect()
    }
    assert got == _oracle_pairs(points, windows)
    # boundary semantics spot checks: start inclusive, end exclusive,
    # overlapping windows each emit a row
    assert ("p2", "w1") in got and ("p1", "w1") not in got
    assert ("p7", "w3") in got and ("p7", "w4") in got


def test_semi_and_anti_partition_the_points(points, windows):
    kw = dict(left_on="user", right_on="wuser", bucket_width=900.0)
    semi = {r["pid"] for r in
            interval_join(points, windows, "ts", "start", "end",
                          how="left_semi", **kw).collect()}
    anti = {r["pid"] for r in
            interval_join(points, windows, "ts", "start", "end",
                          how="left_anti", **kw).collect()}
    inside = {p for p, _ in _oracle_pairs(points, windows)}
    assert semi == inside
    assert anti == {r["pid"] for r in points.collect()} - inside
    # NULL-ts point is in no window -> kept by anti
    assert "p5" in anti


def test_no_equi_key_join(spark):
    pts = spark.range(0, 100).select(
        F.col("id"), F.timestamp_seconds(F.col("id") * 60).alias("ts")
    )
    ivl = spark.createDataFrame(
        pd.DataFrame(
            [("a", dt.datetime.fromtimestamp(0, dt.UTC).replace(tzinfo=None),
              dt.datetime.fromtimestamp(600, dt.UTC).replace(tzinfo=None))],
            columns=["tag", "s", "e"],
        )
    )
    out = interval_join(pts, ivl, "ts", "s", "e", ["tag"], bucket_width=60.0)
    # minutes 0..9 -> ids 0..9 (end 600 s exclusive)
    assert sorted(r["id"] for r in out.collect()) == list(range(10))


def test_interval_join_validations(points, windows):
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(points, windows, "ts", "start", "end", bucket_width=0)
    with pytest.raises(ValueError, match="how"):
        interval_join(points, windows, "ts", "start", "end", how="full")
    with pytest.raises(ValueError, match="same length"):
        interval_join(points, windows, "ts", "start", "end",
                      left_on=["user"], right_on=[])
    with pytest.raises(ValueError, match="collide"):
        interval_join(points.withColumnRenamed("pid", "m_wid"),
                      windows, "ts", "start", "end", ["wid"], prefix="m_")


def test_key_profile_counts_share_hotx(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a"] * 60 + ["b"] * 30 + ["c"] * 9 + ["d"]}
        )
    )
    rows = key_profile(df, "k", top_n=3).collect()
    assert [r["k"] for r in rows] == ["a", "b", "c"]
    a = rows[0]
    assert a["n"] == 60
    assert a["share"] == 0.6
    # 4 distinct keys, mean 25 rows/key -> a is 2.4x
    assert a["hot_x"] == 2.4


def test_key_profile_tiebreak_and_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": ["z", "y", "x", "x"]}))
    rows = key_profile(df, ["k"], top_n=2).collect()
    assert [r["k"] for r in rows] == ["x", "y"]
    with pytest.raises(ValueError, match="top_n"):
        key_profile(df, "k", top_n=0)
    with pytest.raises(ValueError, match="collide"):
        key_profile(df.withColumnRenamed("k", "share"), "share")
