"""PII redaction (operators/redact.py) and URL/domain profiling
(operators/web.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hashio_spark.operators.redact import DEFAULT_PATTERNS, redact
from hashio_spark.operators.web import domain_filter, domain_profile, extracted_domains


@pytest.fixture(scope="module")
def pii_rows(spark):
    rows = [
        (0, "mail a.user+tag@corp.example.com or b@x.io today"),
        (1, "from 192.168.0.1 to 10.0.0.255, was 999.999.999.999"),
        (2, "ssn 123-45-6789 phone +1 555-867-5309 done"),
        (3, "clean text, no pii at all"),
        (4, ""),
        (5, None),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id", "text"]))


def test_redact_replaces_and_counts(pii_rows):
    out = {r["id"]: r for r in redact(pii_rows, "text").collect()}
    assert out[0]["text_redacted"] == "mail <EMAIL> or <EMAIL> today"
    assert out[0]["n_email"] == 2 and out[0]["n_phone"] == 0
    # 999.999.999.999 still matches the shape rule (\d{1,3} thrice) —
    # redaction is pattern-level, not semantic validation
    assert out[1]["text_redacted"] == "from <IP> to <IP>, was <IP>"
    assert out[1]["n_ipv4"] == 3
    # ssn rule runs before the greedy phone rule and wins its span
    assert out[2]["text_redacted"] == "ssn <SSN> phone <PHONE> done"
    assert out[2]["n_ssn"] == 1 and out[2]["n_phone"] == 1
    assert out[3]["text_redacted"] == out[3]["text"]
    assert out[4]["text_redacted"] == "" and out[4]["n_email"] == 0
    assert out[5]["text_redacted"] is None


def test_redact_order_matters(spark):
    df = spark.createDataFrame(pd.DataFrame([(0, "id 123-45-6789")], columns=["id", "text"]))
    # with phone FIRST, the greedy run swallows the SSN shape
    flipped = tuple(p for p in DEFAULT_PATTERNS if p[0] == "phone") + tuple(
        p for p in DEFAULT_PATTERNS if p[0] != "phone"
    )
    r = redact(df, "text", patterns=flipped).collect()[0]
    assert r["text_redacted"] == "id <PHONE>"
    assert r["n_phone"] == 1 and r["n_ssn"] == 0


def test_redact_validations(pii_rows):
    with pytest.raises(ValueError, match="duplicate"):
        redact(pii_rows, "text", patterns=(("a", "x", "y"), ("a", "z", "w")))
    with pytest.raises(ValueError, match="collide"):
        redact(pii_rows.withColumnRenamed("id", "n_email"), "text")


@pytest.fixture(scope="module")
def url_rows(spark):
    rows = [
        (0, "see https://A.Example.COM/page and http://b.example.net"),
        (1, "again https://a.example.com/other"),
        (2, "no links here"),
        (3, None),
        (4, "dup https://a.example.com/1 https://a.example.com/2"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_extracted_domains_lowercases(url_rows):
    got = {
        r["doc_id"]: r["d"]
        for r in url_rows.select("doc_id", extracted_domains("text").alias("d")).collect()
    }
    assert got[0] == ["a.example.com", "b.example.net"]
    assert got[2] == []
    assert got[3] is None


def test_domain_profile_hits_vs_docs(url_rows):
    prof = {r["domain"]: (r["n_hits"], r["n_docs"]) for r in domain_profile(url_rows).collect()}
    # doc 4 mentions a.example.com twice -> 4 hits over 3 docs
    assert prof["a.example.com"] == (4, 3)
    assert prof["b.example.net"] == (1, 1)
    top1 = domain_profile(url_rows, top_n=1).collect()
    assert [r["domain"] for r in top1] == ["a.example.com"]


def test_domain_filter_block_and_keep(url_rows):
    blocked = domain_filter(url_rows, ["a.example.com"])
    assert sorted(r["doc_id"] for r in blocked.collect()) == [2, 3]
    kept = domain_filter(url_rows, ["A.EXAMPLE.COM"], keep=True)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 4]
    # blocklist as a DataFrame works too
    bl = url_rows.sparkSession.createDataFrame(
        pd.DataFrame({"domain": ["B.example.net"]})
    )
    assert sorted(r["doc_id"] for r in domain_filter(url_rows, bl).collect()) == [1, 2, 3, 4]
