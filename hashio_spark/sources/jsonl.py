"""JSONL document source with corrupt-record quarantine.

LLM training corpora overwhelmingly arrive as (gzipped) JSONL — one
document object per line — and real crawls always contain a tail of
malformed lines (truncated writes, encoding damage, schema drift).  A
validation engine must not silently drop those: the reference's posture
is that every input either produces a manifest row or a visible error
(its walk raises on unreadable files, ``/root/reference/lib/hashio/
utils.py:152-209``); the distributed analog is to ROUTE bad lines to a
quarantine DataFrame instead of crashing the job or vanishing them.

Spark-first shape: ``spark.read.json`` in PERMISSIVE mode with
``columnNameOfCorruptRecord`` — schema enforced at the scan (no
sampling-inference job over 100 TB), gzip decoded transparently by the
codec layer, malformed lines carried whole in the corrupt column.
Measured PERMISSIVE semantics (probed against Spark 4.1): a
type-mismatched field ALSO fills the corrupt column with the raw line
while the rest of the row parses, so the split below distinguishes
``malformed`` (nothing parseable) from ``type`` (partial parse) and
``missing:<field>`` (parsed clean but a required field is null).  The
good/bad split is two lazy filters over ONE scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


@dataclass(frozen=True)
class JsonlBatch:
    """Split result: ``good`` rows match the contract; ``bad`` rows carry
    (raw_line, reason) for quarantine/replay — never silently dropped."""

    good: DataFrame
    bad: DataFrame


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: tuple[str, ...] = ("doc_id",),
) -> JsonlBatch:
    """Read JSONL documents with ``schema`` enforced at the scan.

    A line lands in ``bad`` with reason ``malformed`` (not parseable
    JSON — every contract field null), ``type`` (parseable but at least
    one field's value violated its declared type; the rest of the row
    parsed), or ``missing:<field>`` (parsed clean, required field
    null/absent).  The quarantine carries the RAW line, so a re-ingest
    after a schema fix replays from the quarantine alone.

    Scale: one scan, schema supplied (no inference pass over the
    corpus), gzip handled by the codec layer, both outputs lazy
    projections of the same parsed batch.
    """
    data_cols = [f.name for f in schema.fields]
    if CORRUPT_COL in data_cols:
        raise ValueError(f"schema must not predeclare {CORRUPT_COL}")
    # StructType.add MUTATES in place — build a fresh schema so the
    # caller's contract object (and our data_cols) stay corrupt-free
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    for r in required:
        if r not in data_cols:
            raise ValueError(f"required field {r!r} not in schema")

    corrupt = F.col(CORRUPT_COL).isNotNull()
    # F.greatest requires >=2 columns (pyspark ValueError on one) — a
    # one-field schema block is a legal contract (r4 ADVICE)
    parsed_flags = [F.col(c).isNotNull() for c in data_cols]
    any_parsed = parsed_flags[0] if len(parsed_flags) == 1 else F.greatest(*parsed_flags)
    reason = F.coalesce(
        F.when(corrupt & ~any_parsed, F.lit("malformed")),
        F.when(corrupt, F.lit("type")),
        *[F.when(F.col(r).isNull(), F.lit(f"missing:{r}")) for r in required],
    )

    flagged = raw.withColumn("_reason", reason)
    good = flagged.filter(F.col("_reason").isNull()).select(*data_cols)
    bad = flagged.filter(F.col("_reason").isNotNull()).select(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct(*data_cols))).alias("raw_line"),
        F.col("_reason").alias("reason"),
    )
    return JsonlBatch(good=good, bad=bad)


def quarantine_summary(bad: DataFrame) -> DataFrame:
    """One row per reason with counts — the gate a pipeline alerts on
    (algebraic agg, map-side partials)."""
    return bad.groupBy("reason").agg(F.count(F.lit(1)).alias("n_lines"))


def docs_from_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int = 64,
) -> DataFrame:
    """Adapt a FLAT text corpus (the JSONL shape: one text per row) into
    the interleaved-document schema so it can run the FULL flagship
    validator (span digests, uniqueness, stats, manifest/resume) without
    a separate code path: each doc becomes a single text span at offset
    0, and ``partition_id`` is derived as ``pmod(xxhash64(doc_id), n)``
    — content-deterministic, so the manifest rows (and resume
    anti-joins) are identical under any input file layout.

    Pure projection: no shuffle, no UDF; the validator's one-scan plan
    is unchanged.
    """
    spans = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            F.col(text_col).cast("string").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_partitions))
        .cast("int").alias("partition_id"),
        spans.alias("spans"),
    )
