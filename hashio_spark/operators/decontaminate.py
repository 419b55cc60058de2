"""Benchmark decontamination: train/test n-gram overlap detection.

A training-data pipeline must be able to answer "which training documents
contain n-grams from my evaluation benchmarks?" before a corpus ships —
the n-gram-overlap decontamination used by most published LLM training
pipelines.  Expressed Spark-first:

* both sides are tokenized and shingled with the SAME staged projections
  as the MinHash family (``functions.text.word_shingles_from_tokens`` —
  bound-attribute staging, no interpreted-lambda recompute);
* the benchmark side (eval suites: thousands of docs) collapses to a
  DISTINCT shingle set and is **broadcast** — the trillion-row training
  side is never shuffled for the join;
* per-doc shingles are ``array_distinct``-ed BEFORE the explode, so the
  join input is bounded by unique-grams-per-doc, and the only shuffle is
  the final per-doc hit count aggregation;
* ``hashed=True`` joins on ``xxhash64(shingle)`` (8-byte keys, the scale
  path); ``hashed=False`` joins on raw shingle strings (oracle-parity
  path — replicable in any SQL engine).

Extends the reference's dedupe family (``/root/reference/lib/hashio/
encoder.py:463-500``) from identical-content to cross-corpus n-gram
containment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hashio_spark.functions.text import word_shingles_from_tokens


def _doc_grams(df: DataFrame, key_col: str, text_col: str, k: int, hashed: bool) -> DataFrame:
    toked = df.select(F.col(key_col).alias("key"), F.split(F.col(text_col), r"\s+").alias("_toks"))
    shingled = toked.select("key", F.array_distinct(word_shingles_from_tokens("_toks", k)).alias("_sh"))
    # explode_OUTER + post-filter, not explode: Catalyst's
    # InferFiltersFromGenerate adds `size(child)>0 AND isnotnull(child)`
    # below a plain explode, and predicate pushdown substitutes the WHOLE
    # tokenize→shingle→distinct pipeline into that filter — the pipeline
    # then runs 2-3× per row in interpreted mode (measured 7×: 3.2 s →
    # 0.45 s at sf0.1).  explode_outer gets no inferred filter; empty
    # docs surface one NULL gram dropped on the GENERATED attribute,
    # which cannot be pushed below the Generate.  (BENCH.md finding #8.)
    g = shingled.select("key", F.explode_outer("_sh").alias("gram")).filter(
        F.col("gram").isNotNull()
    )
    if hashed:
        g = g.select("key", F.xxhash64("gram").alias("gram"))
    return g


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_hits: int = 1,
    hashed: bool = True,
) -> DataFrame:
    """(key, n_shared) for every training doc sharing ≥ ``min_hits``
    distinct k-gram shingles with the benchmark corpus.

    ``n_shared`` counts DISTINCT contaminated shingles per doc (the usual
    decontamination severity signal); filter or anti-join the result
    against the corpus to drop flagged docs."""
    doc_g = _doc_grams(docs, key_col, text_col, k, hashed)
    bench_g = (
        _doc_grams(benchmark, key_col, text_col, k, hashed)
        .select("gram")
        .distinct()
    )
    hits = (
        doc_g.join(F.broadcast(bench_g), "gram")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_shared"))  # per-doc grams pre-distincted
        .filter(F.col("n_shared") >= min_hits)
    )
    return hits.select(F.col("key").alias(key_col), "n_shared")
