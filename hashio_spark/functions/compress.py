"""Compressed-content decode step (reference S4 analog).

The reference detects gzip members by magic and decompresses before
hashing (``/root/reference/lib/hashio/utils.py:212-245``, CLI
``--uncompress``), so a re-compressed file keeps a stable content digest.
Here the unit is a binary *column*: detection is a JVM expression over
the leading magic bytes (codegen, zero Python), decompression is an
Arrow-batched pandas UDF (gzip/zlib are CPU-bound Python-side work, the
same tier as the multimodal decoders — never per-row Python).

Scale note: decompression inflates row width; pair with a
``repartition`` on a salt when compressed blobs are skewed (see
``operators/multimodal.salted_repartition``).
"""

from __future__ import annotations

import gzip
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

GZIP_MAGIC = bytes([0x1F, 0x8B])


def is_gzip_expr(col: Column | str) -> Column:
    """JVM-side gzip-member detection: leading ``1f 8b`` magic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, 2) == F.lit(GZIP_MAGIC)


def _gunzip_one(b: object) -> bytes | None:
    if b is None:
        return None
    data = bytes(b)
    if data[:2] == GZIP_MAGIC:
        try:
            return gzip.decompress(data)
        except (OSError, zlib.error, EOFError):
            # corrupt member: pass the raw bytes through so the digest
            # pass still hashes *something* deterministic; the tamper is
            # caught by the digest mismatch (reference behavior: the
            # uncompress step falls back to the original file)
            return data
    return data


def gunzip_udf():
    """Pandas UDF: binary → binary, decompressing gzip members (magic
    detected per value; non-gzip bytes pass through unchanged)."""

    @F.pandas_udf(BinaryType())
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(_gunzip_one)

    return _udf


def uncompressed_content(df: DataFrame, content_col: str = "content", out_col: str | None = None) -> DataFrame:
    """Add an uncompressed view of a binary column (reference
    ``--uncompress`` digest path: digest the decoded bytes, so
    ``gzip(x)`` and ``x`` verify equal)."""
    out = out_col or content_col
    return df.withColumn(out, gunzip_udf()(F.col(content_col)))


def digest_uncompressed(df: DataFrame, content_col: str, algo: str = "xxh64") -> DataFrame:
    """(…, digest) over the decoded content — parity hexdigest kernels."""
    from hashio_spark.functions.digests import parity_udf

    return uncompressed_content(df, content_col, "_uc").withColumn(
        "digest", parity_udf(algo)(F.col("_uc"))
    ).drop("_uc")
