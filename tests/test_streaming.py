"""Streaming incremental validation: micro-batches merge idempotently into
the manifest store (the reference's periodic-merge checkpoint analog)."""

from pyspark.sql import functions as F

from hashio_spark.sources.manifest_store import ManifestStore
from hashio_spark.streaming.incremental import stream_validation, violation_rate_stream


def test_stream_validation_available_now(spark, tmp_path):
    from hashio_spark.datagen import documents_interleaved

    src_dir = str(tmp_path / "src")
    documents_interleaved(spark, n_docs=400, n_partitions=4).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    store = ManifestStore(spark, str(tmp_path / "manifest"))
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src_dir)
    q = stream_validation(
        stream, store, run_id="stream-run", algo="xxh64",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    m = store.read()
    rows = m.collect()
    assert {r["run_id"] for r in rows} == {"stream-run"}
    assert {r["partition_id"] for r in rows} == {0, 1, 2, 3}
    # micro-batches merged idempotently: exactly one row per (partition, algo)
    assert len(rows) == 4
    # restart with same checkpoint: no new work, manifest unchanged
    digests_before = {(r["partition_id"], r["digest"]) for r in rows}
    stream2 = spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src_dir)
    q2 = stream_validation(stream2, store, run_id="stream-run", algo="xxh64", checkpoint_dir=str(tmp_path / "ckpt"))
    q2.awaitTermination(60)
    after = {(r["partition_id"], r["digest"]) for r in store.read().collect()}
    assert after == digests_before


def test_violation_rate_stream(spark, tmp_path):
    from hashio_spark.datagen import documents_interleaved

    src_dir = str(tmp_path / "src2")
    docs = documents_interleaved(spark, n_docs=300, n_partitions=4).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    docs.write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = violation_rate_stream(stream)
    q = (
        agg.writeStream.outputMode("complete").format("memory").queryName("vr")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from vr").collect()
    assert len(out) == 1
    assert out[0]["docs"] == 300 and out[0]["violating_docs"] > 0
