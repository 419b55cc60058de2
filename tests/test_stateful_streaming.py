"""applyInPandasWithState streaming dedupe: cross-batch state via
checkpoint restore (the streaming analog of the reference's cache-hit
skip, encoder.py:406-430)."""

import os

import pandas as pd
import pytest


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"], exist_ok=True)
    return d


def _write_batch(spark, path, rows, name):
    pdf = pd.DataFrame(rows, columns=["doc_id", "digest"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(f"{path}/{name}")


def _run_once(spark, dirs):
    from hashio_spark.streaming.stateful import dedupe_stream

    schema = "doc_id string, digest string"
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(dirs["in"])
    )
    deduped = dedupe_stream(stream, digest_col="digest", n_groups=8)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", dirs["out"])
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_dedupe_stream_cross_batch_state(spark, dirs):
    _write_batch(spark, dirs["in"], [("a", "h1"), ("b", "h2"), ("a2", "h1")], "b1")
    _run_once(spark, dirs)
    out1 = {r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()}
    # intra-batch dedupe: one of the h1 docs survives, h2 survives
    assert len(out1) == 2 and "b" in out1 and (out1 & {"a", "a2"})

    # second micro-batch re-delivers h2 and adds h3; state must carry over
    _write_batch(spark, dirs["in"], [("b2", "h2"), ("c", "h3")], "b2")
    _run_once(spark, dirs)
    out2 = {r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()}
    assert "c" in out2 and "b2" not in out2
    assert len(out2) == 3


def test_dedupe_stream_null_digests_pass_through(spark, dirs):
    """NULL digests must pass through un-deduped and never enter state
    (a None in the seen array crashed the state update — round-2 ADVICE)."""
    _write_batch(spark, dirs["in"], [("a", "h1"), ("n1", None), ("n2", None)], "b1")
    _run_once(spark, dirs)
    out1 = {r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()}
    assert {"a", "n1", "n2"} <= out1
    # next batch: more nulls still pass; h1 still deduped
    _write_batch(spark, dirs["in"], [("a2", "h1"), ("n3", None)], "b2")
    _run_once(spark, dirs)
    out2 = {r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()}
    assert "n3" in out2 and "a2" not in out2


def test_dedupe_stream_state_is_bounded(spark, dirs):
    """A hot group's state must not grow past max_state_per_group; rows
    beyond the bound pass through (at-least-once dedupe, never an OOM)."""
    from hashio_spark.streaming.stateful import dedupe_stream

    schema = "doc_id string, digest string"
    # single group so the bound is exercised deterministically
    def run(bound):
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(dirs["in"])
        )
        deduped = dedupe_stream(stream, digest_col="digest", n_groups=1,
                                max_state_per_group=bound)
        q = (
            deduped.writeStream.format("parquet")
            .option("path", dirs["out"])
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(spark, dirs["in"], [(f"d{i}", f"h{i}") for i in range(10)], "b1")
    run(bound=4)
    # all 10 unique digests emitted; only 4 tracked
    out1 = {r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()}
    assert len(out1) == 10
    # re-deliver all 10: the 4 tracked ones are deduped, the rest pass
    _write_batch(spark, dirs["in"], [(f"r{i}", f"h{i}") for i in range(10)], "b2")
    run(bound=4)
    out2 = {r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()}
    redelivered = {d for d in out2 if d.startswith("r")}
    assert len(redelivered) == 6  # 10 - 4 tracked
