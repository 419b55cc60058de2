"""Canonicalization + composite digest parity tests.

The Python oracle here re-implements the reference's ``composite_hash``
semantics exactly (sorted (key, hash) tuples → "key:hash" lines → "\n"
join → digest, /root/reference/lib/hashio/encoder.py:447-460) and checks
the Spark aggregate reproduces it byte-for-byte."""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from hashio_spark.functions.canonical import (
    agg_digest_xor,
    canonical_span_expr,
    composite_digest_expr,
    doc_digest_expr,
)
from hashio_spark.functions.digests import parity_hexdigest


def composite_hash_oracle(pairs, algo="md5"):
    entries = [f"{k}:{h}" for k, h in sorted(pairs)]
    data = "\n".join(entries).encode("utf-8")
    if algo == "md5":
        return hashlib.md5(data).hexdigest()
    return parity_hexdigest(data, algo)


def test_composite_digest_parity(spark):
    pairs = [("b", "h2"), ("a", "h9"), ("c", "h1"), ("a", "h0")]
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["k", "h"]))
    got = df.agg(composite_digest_expr("k", "h", "md5").alias("d")).first()["d"]
    assert got == composite_hash_oracle(pairs)


def test_composite_digest_empty_group(spark):
    # reference: composite of empty list = digest of empty string
    df = spark.createDataFrame(pd.DataFrame({"k": ["x"], "h": ["y"]})).filter("k = 'zz'")
    got = df.agg(composite_digest_expr("k", "h", "md5").alias("d")).first()["d"]
    assert got == hashlib.md5(b"").hexdigest()


def test_composite_digest_partition_invariant(spark, docs):
    """Same data, different physical partitioning → same composite digest
    (the determinism the reference gets from sorted())."""
    d = docs.withColumn("dg", doc_digest_expr("spans", "md5"))
    a = d.groupBy("partition_id").agg(composite_digest_expr("doc_id", "dg", "md5").alias("c"))
    b = (
        d.repartition(3)
        .groupBy("partition_id")
        .agg(composite_digest_expr("doc_id", "dg", "md5").alias("c"))
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_agg_digest_xor_order_independent(spark):
    pdf = pd.DataFrame({"k": [f"k{i}" for i in range(100)], "h": [f"h{i}" for i in range(100)]})
    df1 = spark.createDataFrame(pdf)
    df2 = spark.createDataFrame(pdf.sample(frac=1.0, random_state=7)).repartition(13)
    d1 = df1.agg(agg_digest_xor("k", "h").alias("d")).first()["d"]
    d2 = df2.agg(agg_digest_xor("k", "h").alias("d")).first()["d"]
    assert d1 == d2
    # sensitive to any single-row change
    pdf3 = pdf.copy()
    pdf3.loc[50, "h"] = "tampered"
    d3 = spark.createDataFrame(pdf3).agg(agg_digest_xor("k", "h").alias("d")).first()["d"]
    assert d3 != d1


def test_canonical_span_null_handling(spark):
    rows = [
        ("d1", [("text", "hello", None, 0), ("image", None, "asset-1", 10)]),
        ("d2", [("text", None, None, 0)]),     # null text ≠ empty-string text? both "" in canon
        ("d3", [("text", "", None, 0)]),
    ]
    schema = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    df = spark.createDataFrame(rows, schema)
    got = {r["doc_id"]: r["c"] for r in df.select("doc_id", canonical_span_expr().alias("c")).collect()}
    assert got["d1"] == "text|hello||0\nimage||asset-1|10"
    # canonical form maps null→"" (documented); d2 and d3 intentionally equal
    assert got["d2"] == got["d3"] == "text|||0"


def test_doc_digest_order_sensitivity(spark):
    """Span order is part of the identity (per-row invariant: span-sequence
    equality over (kind, text, media_ref, ORDER))."""
    schema = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    a = spark.createDataFrame([("d", [("text", "x", None, 0), ("text", "y", None, 10)])], schema)
    b = spark.createDataFrame([("d", [("text", "y", None, 10), ("text", "x", None, 0)])], schema)
    da = a.select(doc_digest_expr("spans", "md5").alias("d")).first()["d"]
    db = b.select(doc_digest_expr("spans", "md5").alias("d")).first()["d"]
    assert da != db


def test_doc_digest_parity_udf_path(spark):
    schema = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    df = spark.createDataFrame([("d", [("text", "hello", None, 0)])], schema)
    got = df.select(doc_digest_expr("spans", "xxh64", parity=True).alias("d")).first()["d"]
    assert got == parity_hexdigest(b"text|hello||0", "xxh64")


def test_agg_digest_fold_sees_even_multiplicities(spark):
    """The scalable group fold must NOT be blind to even multiplicities
    (an XOR fold digests {x, A, A} the same as {x} — round-2 fix)."""
    import pandas as pd

    base = pd.DataFrame({"k": ["x"], "h": ["h0"]})
    dup2 = pd.DataFrame({"k": ["x", "a", "a"], "h": ["h0", "h1", "h1"]})
    swap = pd.DataFrame({"k": ["x", "b", "b"], "h": ["h0", "h2", "h2"]})
    d_base = spark.createDataFrame(base).agg(agg_digest_xor("k", "h").alias("d")).first()["d"]
    d_dup2 = spark.createDataFrame(dup2).agg(agg_digest_xor("k", "h").alias("d")).first()["d"]
    d_swap = spark.createDataFrame(swap).agg(agg_digest_xor("k", "h").alias("d")).first()["d"]
    assert d_base != d_dup2
    assert d_dup2 != d_swap
    assert all(len(d) == 16 for d in (d_base, d_dup2, d_swap))
