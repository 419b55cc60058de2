"""Gzip decode path (S4) + ignore filter (S2), mirroring the reference's
gzip verify + tamper suite (/root/reference/tests/test_hashio.py:523-599)
and ignore-pattern config (config.py:105-139)."""

import gzip

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hashio_spark.functions.compress import digest_uncompressed, is_gzip_expr, uncompressed_content
from hashio_spark.operators.ignore import DEFAULT_IGNORE_PATTERNS, apply_ignore, ignore_predicate


@pytest.fixture(scope="module")
def blobs(spark):
    payload = b"span content that will be compressed and verified\n" * 20
    rows = [
        ("plain", payload),
        ("gz", gzip.compress(payload, mtime=0)),
        ("gz_tampered", None),  # filled below
        ("empty", b""),
        ("null", None),
    ]
    tampered = bytearray(gzip.compress(payload, mtime=0))
    tampered[len(tampered) // 2] ^= 0xFF  # flip a byte inside the deflate stream
    rows[2] = ("gz_tampered", bytes(tampered))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["name", "content"])), payload


def test_gzip_detection_and_decode(blobs):
    df, payload = blobs
    out = {r["name"]: (r["is_gz"], r["content"]) for r in
           uncompressed_content(df, "content").withColumn("is_gz", is_gzip_expr("content")).collect()}
    # NB: is_gzip_expr runs on the DECODED column here (same name) — decoded
    # payload is not gzip anymore
    assert bytes(out["plain"][1]) == payload
    assert bytes(out["gz"][1]) == payload


def test_gzip_digest_parity_and_tamper(blobs):
    """gzip(x) and x must digest equal through the uncompress path;
    a tampered member must NOT verify (reference tamper suite analog)."""
    df, payload = blobs
    d = {r["name"]: r["digest"] for r in digest_uncompressed(df, "content", "xxh64").collect()}
    assert d["plain"] == d["gz"]
    assert d["gz_tampered"] != d["gz"]
    # parity kernels digest NULL/empty content as the empty-input digest
    # (the reference hashes empty files the same way)
    assert d["null"] == d["empty"] == "ef46db3751d8e999"
    from hashio_spark.functions.digests import parity_hexdigest

    assert d["plain"] == parity_hexdigest(payload, "xxh64")


def test_ignore_filter_patterns(spark):
    rows = [
        ("data/part-0001.parquet",),
        ("data/.DS_Store",),
        ("data/__pycache__",),
        ("src/module.pyc",),
        ("notes.txt~",),
        ("data/real_file.txt",),
        ("a/.git/config",),
        ("keep/.gitignore_like.txt",),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["path"]))
    kept = {r["path"] for r in apply_ignore(df, "path").collect()}
    assert kept == {"data/part-0001.parquet", "data/real_file.txt", "keep/.gitignore_like.txt"}


def test_ignore_env_override(spark, monkeypatch):
    from hashio_spark.operators import ignore as ig

    monkeypatch.setenv(ig.ENV_VAR, "*.parquet:secret*")
    pats = ig.ignore_patterns()
    assert pats == ("*.parquet", "secret*")
    df = spark.createDataFrame(pd.DataFrame([("a.parquet",), ("b.txt",), ("secret1",)], columns=["path"]))
    kept = {r["path"] for r in df.filter(~ignore_predicate("path", pats)).collect()}
    assert kept == {"b.txt"}
    monkeypatch.delenv(ig.ENV_VAR)
    assert ig.ignore_patterns() == DEFAULT_IGNORE_PATTERNS


def test_subpath_predicate(spark):
    from hashio_spark.operators.ignore import subpath_predicate

    df = spark.createDataFrame(
        pd.DataFrame([("/a/b",), ("/a/b/c.txt",), ("/a/bc/d.txt",), ("/a/b2",), ("/x/a/b/c",)],
                     columns=["path"]))
    under = {r["path"] for r in df.filter(subpath_predicate("path", "/a/b")).collect()}
    assert under == {"/a/b", "/a/b/c.txt"}


def test_ignore_patterns_are_fullmatch_anchored(spark):
    """fnmatch semantics are FULL-name match: '.git' must not drop a
    legitimate 'foo.git', '.cache' must not drop 'a.cache' (RLIKE is
    unanchored find() — round-2 ADVICE anchoring fix)."""
    rows = [
        ("repo/foo.git",),          # keep: '.git' is a full-name pattern
        ("a.cache",),               # keep
        ("my_desktop.ini",),        # keep: 'desktop.ini' is not a suffix rule
        ("work/foo.#bar",),         # keep: '.#*' anchors at name start
        ("repo/.git",),             # drop
        ("a/.git/config",),         # drop via '.git/*' segment-aligned
        ("deep/x/.cache/obj",),     # drop via '.cache/*' segment-aligned
        ("x/my.git/config",),       # keep: 'my.git' dir is not '.git'
        (".cache",),                # drop
    ]
    import pandas as _pd

    df = spark.createDataFrame(_pd.DataFrame(rows, columns=["path"]))
    kept = {r["path"] for r in apply_ignore(df, "path").collect()}
    assert kept == {"repo/foo.git", "a.cache", "my_desktop.ini", "work/foo.#bar", "x/my.git/config"}
