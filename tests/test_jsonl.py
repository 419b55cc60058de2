"""JSONL source with corrupt-record quarantine (sources/jsonl.py)."""

import gzip
import json

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


def test_one_column_schema(spark, tmp_path):
    """r4 ADVICE: F.greatest needs >=2 columns, so a legal one-field
    schema crashed with an unrelated ValueError instead of gating."""
    p = tmp_path / "one.jsonl"
    p.write_text('{"text": "ok"}\nBROKEN LINE\n{"text": "also ok"}\n')
    schema = T.StructType().add("text", T.StringType())
    b = read_jsonl_docs(spark, str(p), schema, required=("text",))
    assert {r.text for r in b.good.collect()} == {"ok", "also ok"}
    bad = b.bad.collect()
    assert len(bad) == 1 and bad[0].reason == "malformed"


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


def test_docs_from_text_runs_flagship(spark, tmp_path):
    """Flat JSONL -> single-span docs -> FULL validate pass: digests land,
    partition_id is content-deterministic (layout-independent)."""
    from pyspark.sql import functions as F

    from hashio_spark.plans.validate import validate
    from hashio_spark.sources.jsonl import docs_from_text, read_jsonl_docs

    p = tmp_path / "c.jsonl"
    p.write_text("".join(f'{{"doc_id": "d{i}", "text": "doc number {i}"}}\n' for i in range(50)))
    b = read_jsonl_docs(
        spark, str(p),
        SCHEMA.__class__().add("doc_id", "string").add("text", "string"),
    )
    docs = docs_from_text(b.good, n_partitions=8)
    assert docs.columns == ["doc_id", "partition_id", "spans"]
    res = validate(docs, catalog=None, algo="xxh64")
    rep = res.report.collect()
    assert sum(r.row_count for r in rep) == 50
    assert all(r.digest for r in rep)
    res.violations.unpersist()
    # layout independence: same rows through a different partitioning
    again = docs_from_text(b.good.repartition(3), n_partitions=8)
    a = {(r.doc_id, r.partition_id) for r in docs.select("doc_id", "partition_id").collect()}
    b2 = {(r.doc_id, r.partition_id) for r in again.select("doc_id", "partition_id").collect()}
    assert a == b2


def test_cli_validate_jsonl_end_to_end(spark, tmp_path, capsys):
    from hashio_spark.cli import main

    src = tmp_path / "c.jsonl"
    src.write_text(
        '{"doc_id": "a", "text": "alpha"}\n'
        '{"doc_id": "b", "text": "beta"}\n'
        "BROKEN LINE\n"
    )
    man = str(tmp_path / "m")
    rc = main(["validate", "--input", str(src), "--format", "jsonl",
               "--manifest", man, "--run-id", "j1", "--algo", "xxh64"])
    assert rc == 0
    out = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert any(d.get("check") == "quarantine" and d["reason"] == "malformed" for d in out)
    assert out[-1]["docs"] == 2 and out[-1]["quarantined"] == 1

    from hashio_spark.sources.manifest_store import ManifestStore
    assert ManifestStore(spark, man).list_runs() == ["j1"]

