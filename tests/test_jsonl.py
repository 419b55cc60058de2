"""JSONL source with corrupt-record quarantine (sources/jsonl.py)."""

import gzip

import pytest
from pyspark.sql import types as T

from hashio_spark.sources.jsonl import JsonlBatch, quarantine_summary, read_jsonl_docs

SCHEMA = (
    T.StructType()
    .add("doc_id", T.LongType())
    .add("text", T.StringType())
    .add("n", T.LongType())
)


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "d.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "n": 5}\n'
        '{"doc_id": 2, "text": "bad-type", "n": "oops"}\n'
        '{"doc_id": 3, "text": "missing-n"}\n'
        '{"text": "missing required doc_id", "n": 1}\n'
        "NOT JSON AT ALL\n"
        '{"doc_id": 6, "text": "ok2", "n": 7}\n'
    )
    return str(p)


def test_split_and_reasons(spark, jsonl_dir):
    b = read_jsonl_docs(spark, jsonl_dir, SCHEMA, required=("doc_id",))
    good = {r.doc_id for r in b.good.collect()}
    assert good == {1, 3, 6}  # missing OPTIONAL n stays good
    bad = {r.reason: r.raw_line for r in b.bad.collect()}
    assert set(bad) == {"malformed", "type", "missing:doc_id"}
    # quarantine carries the raw line for replay
    assert bad["malformed"] == "NOT JSON AT ALL"
    assert '"oops"' in bad["type"]
    assert "missing required doc_id" in bad["missing:doc_id"]
    s = {r.reason: r.n_lines for r in quarantine_summary(b.bad).collect()}
    assert s == {"malformed": 1, "type": 1, "missing:doc_id": 1}


def test_required_n_quarantines_partial_rows(spark, jsonl_dir):
    b = read_jsonl_docs(spark, jsonl_dir, SCHEMA, required=("doc_id", "n"))
    assert {r.doc_id for r in b.good.collect()} == {1, 6}
    reasons = sorted(r.reason for r in b.bad.collect())
    assert reasons == ["malformed", "missing:doc_id", "missing:n", "type"]


def test_gzip_transparent(spark, tmp_path):
    p = tmp_path / "d.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write('{"doc_id": 1, "text": "zipped", "n": 1}\nBROKEN\n')
    b = read_jsonl_docs(spark, str(p), SCHEMA)
    assert b.good.count() == 1 and b.bad.count() == 1


def test_contract_guards(spark, jsonl_dir):
    with pytest.raises(ValueError):
        read_jsonl_docs(spark, jsonl_dir, SCHEMA, required=("nope",))
    with pytest.raises(ValueError):
        read_jsonl_docs(
            spark, jsonl_dir,
            T.StructType().add("doc_id", T.LongType()).add("_corrupt_record", T.StringType()),
        )


def test_good_feeds_validate_pipeline(spark, jsonl_dir):
    """The good split plugs straight into downstream ops (one scan)."""
    from hashio_spark.functions.digests import digest_expr
    from pyspark.sql import functions as F

    b = read_jsonl_docs(spark, jsonl_dir, SCHEMA)
    digested = b.good.withColumn("digest", digest_expr("text", "xxh64"))
    assert digested.filter(F.col("digest").isNull()).count() == 0
    assert digested.count() == 3
