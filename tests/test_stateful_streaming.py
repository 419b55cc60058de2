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
