"""The Arrow minhash kernel (functions/digests.minhash4_md5_arrow) must
be byte-identical to the JVM expression form it replaced, including the
NULL/short-doc contract and the shingle-set ride-along."""

import pandas as pd
from pyspark.sql import functions as F

from hashio_spark.functions.digests import _minhash4_rows, minhash4_md5_arrow


def _jvm_sigs(spark, df):
    toked = df.select("doc_id", F.split(F.col("text"), " ").alias("_toks"))
    tk = F.col("_toks")
    idx = F.when(F.size(tk) >= 3, F.sequence(F.lit(1), F.size(tk) - 2)).otherwise(
        F.array().cast("array<int>")
    )
    shingled = toked.select(
        "doc_id", F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i, 3))).alias("_sh")
    )

    def _sig(prefix):
        return F.array_min(
            F.transform(F.col("_sh"), lambda s: F.md5(F.concat(F.lit(prefix), s).cast("binary")))
        )

    return shingled.select("doc_id", *[_sig(f"{k}|").alias(f"sig{k}") for k in range(4)])


def test_kernel_matches_jvm_form(spark):
    rows = [
        (1, "a b c d e"),
        (2, "a b"),                      # <3 tokens -> NULL sigs
        (3, None),                       # NULL text -> NULL sigs
        (4, "x  y z"),                   # double space -> empty token kept
        (5, "the quick brown fox jumps over the lazy dog"),
        (6, "a b c a b c a b c"),        # repeated shingles
        (7, " leading space tail "),     # boundary empties
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = df.select("doc_id", minhash4_md5_arrow(False)(F.col("text")).alias("_s")).select(
        "doc_id", "_s.*"
    )
    want = _jvm_sigs(spark, df)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_kernel_sets_are_distinct_in_first_occurrence_order():
    out = _minhash4_rows(pd.Series(["a b c a b c a b c", None, "x y"]), with_sets=True)
    assert out["sh"][0] == ["a b c", "b c a", "c a b"]
    assert out["sh"][1] is None
    assert out["sh"][2] == []
    assert out["sig0"][1] is None and out["sig0"][2] is None


def test_kernel_min_is_over_hex_order():
    # the min is taken on digest bytes; hex encoding must agree
    import hashlib

    out = _minhash4_rows(pd.Series(["p q r s"]), with_sets=False)
    shingles = ["p q r", "q r s"]
    for k in range(4):
        want = min(hashlib.md5(f"{k}|{s}".encode()).hexdigest() for s in shingles)
        assert out[f"sig{k}"][0] == want
