"""Watermarked stream-stream attribution join (streaming/joins.py):
streaming output must equal the batch bucketed interval join on the
same input."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hashio_spark.operators.ranges import interval_join
from hashio_spark.streaming.joins import attribution_join


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


@pytest.fixture(scope="module")
def click_rows():
    return [
        ("c0", "u1", _ts(0, 30)),
        ("c1", "u1", _ts(1, 0)),    # exactly at window end -> excluded
        ("c2", "u1", _ts(0, 0)),    # exactly at start -> included
        ("c3", "u2", _ts(0, 45)),
        ("c4", "u1", _ts(6, 0)),    # no window
        ("c5", "u3", _ts(0, 10)),   # keyless user
    ]


@pytest.fixture(scope="module")
def signup_rows():
    return [
        ("s1", "u1", _ts(0, 0)),
        ("s2", "u2", _ts(0, 0)),
        ("s3", "u1", _ts(0, 45)),   # overlapping second window for u1
    ]


def _frames(spark, click_rows, signup_rows):
    clicks = spark.createDataFrame(pd.DataFrame(click_rows, columns=["click_id", "user", "ts"]))
    signups = spark.createDataFrame(pd.DataFrame(signup_rows, columns=["signup_id", "s_user", "s_ts"]))
    return clicks, signups


def test_batch_noop_matches_interval_join(spark, click_rows, signup_rows):
    clicks, signups = _frames(spark, click_rows, signup_rows)
    got = {
        (r["click_id"], r["m_signup_id"])
        for r in attribution_join(
            clicks, signups, "ts", "s_ts", "1 hours",
            left_on="user", right_on="s_user",
            value_cols=["signup_id"], prefix="m_",
        ).collect()
    }
    ref = signups.withColumn("s_end", F.col("s_ts") + F.expr("INTERVAL 1 HOURS"))
    want = {
        (r["click_id"], r["m_signup_id"])
        for r in interval_join(
            clicks, ref, "ts", "s_ts", "s_end", ["signup_id"],
            left_on="user", right_on="s_user",
            bucket_width=900.0, prefix="m_",
        ).collect()
    }
    assert got == want
    assert ("c2", "s1") in got and ("c1", "s1") not in got
    assert ("c0", "s1") in got  # c0 at 0:30 hits only s1 (s3 starts 0:45)
    assert ("c3", "s2") in got and ("c5", "s1") not in got


def test_streaming_equals_batch(spark, click_rows, signup_rows, tmp_path):
    clicks, signups = _frames(spark, click_rows, signup_rows)
    cdir, sdir = str(tmp_path / "clicks"), str(tmp_path / "signups")
    clicks.write.parquet(cdir)
    signups.write.parquet(sdir)

    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    ss = spark.readStream.schema(signups.schema).parquet(sdir)
    out = attribution_join(
        cs, ss, "ts", "s_ts", "1 hours",
        left_on="user", right_on="s_user",
        value_cols=["signup_id"], prefix="m_",
        watermark="30 minutes",
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("attrib_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["m_signup_id"])
        for r in spark.sql("SELECT * FROM attrib_out").collect()
    }
    want = {
        (r["click_id"], r["m_signup_id"])
        for r in attribution_join(
            clicks, signups, "ts", "s_ts", "1 hours",
            left_on="user", right_on="s_user",
            value_cols=["signup_id"], prefix="m_",
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_semi_and_validations(spark, click_rows, signup_rows):
    clicks, signups = _frames(spark, click_rows, signup_rows)
    semi = attribution_join(
        clicks, signups, "ts", "s_ts", "1 hours",
        left_on="user", right_on="s_user", how="left_semi",
    )
    # c1 (1:00) is excluded from s1's [0:00, 1:00) but inside s3's
    # overlapping [0:45, 1:45) window
    assert sorted(r["click_id"] for r in semi.collect()) == ["c0", "c1", "c2", "c3"]
    with pytest.raises(ValueError, match="span"):
        attribution_join(clicks, signups, "ts", "s_ts", "24h;drop",
                         left_on="user", right_on="s_user")
    with pytest.raises(ValueError, match="non-empty"):
        attribution_join(clicks, signups, "ts", "s_ts", "1 hours",
                         left_on=[], right_on=[])
    with pytest.raises(ValueError, match="how"):
        attribution_join(clicks, signups, "ts", "s_ts", "1 hours",
                         left_on="user", right_on="s_user", how="left_outer")
    with pytest.raises(ValueError, match="collide"):
        attribution_join(clicks.withColumnRenamed("click_id", "m_signup_id"),
                         signups, "ts", "s_ts", "1 hours",
                         left_on="user", right_on="s_user",
                         value_cols=["signup_id"], prefix="m_")
