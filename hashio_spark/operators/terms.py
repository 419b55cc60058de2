"""Term statistics over a document corpus: TF-IDF and top-terms.

Generalizes the reference's per-file metadata projection
(``/root/reference/lib/hashio/utils.py:107-126``) to per-document term
weights — the standard corpus-quality signal an LLM-data pipeline wants
next to token counts and language ID.

Scale shape (designed for 10^12 docs):
* one explode + hash-aggregate on (doc_id, term) for term frequencies —
  map-side partial counts absorb within-document repetition before the
  shuffle;
* document frequency is a second hash-aggregate over the (doc, term)
  table (vocab-sized output, NOT corpus-sized);
* the corpus row count rides in via a broadcast 1-row cross join;
* the tf×df join keys on term — vocab vs corpus-term-pairs; AQE
  broadcasts the vocab side when it fits, otherwise both sides shuffle
  on term (no skew: stopword-heavy terms fan out across doc partitions
  only in the pair table, never in a collected list);
* top-k per doc is a window PARTITIONED by doc_id (per-partition heaps,
  no global sort).

All arithmetic stays JVM-side; ranking uses the 6-decimal-rounded
weight (plus term as tiebreak) so the order is reproducible across
engines despite last-ulp ``ln`` differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf) — whitespace tokens, empty tokens dropped."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Top-k terms per document by tf·ln(N/df), deterministically ranked.

    Output: (id, term, rank, tfidf) with ``tfidf`` rounded to 6 decimals
    — the SAME rounded value drives the rank so ties resolve identically
    in any engine (term ascending breaks exact ties).
    """
    tf = term_frequencies(docs, id_col, text_col)
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("_n"))
    weighted = (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("_n").cast("double") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    # top-k per doc via ONE hash aggregation (collect_list + sort + slice
    # per doc) instead of a row_number window, which costs a second
    # full shuffle + sort of every (doc, term) row (measured 3.2 → 2.3 s
    # at sf1.0).  The struct sorts ascending on (-tfidf, term) — exactly
    # the window's (tfidf DESC, term ASC) order on the same ROUNDED
    # value — and carries the original tfidf so the emitted double is
    # bit-identical (negating would flip a 0.0 to -0.0).
    top = (
        weighted.groupBy(id_col)
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct((-F.col("tfidf")).alias("_neg"), F.col("term"), F.col("tfidf"))
                    )
                ),
                1,
                top_k,
            ).alias("_top")
        )
        .select(id_col, F.posexplode("_top").alias("_p", "_s"))
    )
    return top.select(
        id_col,
        F.col("_s.term").alias("term"),
        (F.col("_p") + 1).cast("long").alias("rank"),
        F.col("_s.tfidf").alias("tfidf"),
    )


def term_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 10,
    min_df: int = 2,
) -> DataFrame:
    """Inverted index build: (term, df, postings) where ``postings`` is
    the first ``max_postings`` doc ids (ascending) joined with commas —
    the lookup structure contamination checks and exact-phrase dedupe
    verify against, materialized as a table instead of an index file.

    Scale shape: the posting list is CAPPED BEFORE collection — a
    row_number window partitioned by term (WindowGroupLimit pushes the
    top-k below the sort) keeps ``max_postings`` rows per term, so
    ``collect_list`` state is bounded at k for every term; a stopword
    appearing in every one of 10^12 docs still contributes exactly k
    entries.  The df count and the capped postings aggregate share one
    hash-partitioning on term (AQE reuses the exchange).  ``min_df``
    drops the hapax tail, which at web scale is most of the vocabulary.
    """
    toks = (
        docs.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("term")
        )
        .filter(F.col("term") != "")
        .select("term", F.col(id_col).alias("_doc"))
        .distinct()
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") >= min_df
    )
    w = Window.partitionBy("term").orderBy(F.asc("_doc"))
    capped = toks.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_postings
    )
    posts = capped.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("_doc")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("postings")
    )
    return counts.join(posts, "term")


def vocab_coverage(
    docs: DataFrame,
    text_col: str = "text",
    ks: tuple[int, ...] = (10, 100, 1000),
) -> DataFrame:
    """Token coverage of a top-k frequency vocabulary — the
    tokenizer-design question: "how much of the corpus do the k most
    frequent tokens cover?"  One row per k: (k, covered_tokens,
    total_tokens, coverage, vocab_size), ranking ties broken by token
    text so the cut is deterministic across engines.

    Scale shape (10^12 tokens, vocab V ~ 10^7-10^8 types):
    * ONE token hash-aggregate (map-side partials absorb the Zipf skew:
      each mapper pre-sums its own 'the's, so the shuffle carries V
      rows per mapper at most, not the corpus);
    * the top-k cut is TakeOrderedAndProject (per-partition heap of k,
      driver merge of #partitions × k rows) — V is NEVER globally
      sorted;
    * the per-k rank window then runs over max(ks) rows, not V — the
      one SinglePartition exchange in the plan carries ≤ max(ks) rows
      by construction."""
    spark = docs.sparkSession
    max_k = max(ks)
    toks = docs.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    # counts feeds BOTH the totals and the top-k cut; persisted so the
    # corpus-wide tokenize+aggregate runs once (V rows, narrow) — caller
    # releases via hashio_spark.caching.release
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).persist()
    tot = counts.agg(
        F.sum("n").alias("total_tokens"), F.count(F.lit(1)).alias("vocab_size")
    )
    topk = counts.orderBy(F.desc("n"), F.asc("token")).limit(max_k)
    ranked = topk.withColumn(
        "_rk", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token")))
    )
    ks_df = spark.createDataFrame([(int(k),) for k in sorted(set(ks))], "k int")
    cov = (
        ranked.join(F.broadcast(ks_df), ranked["_rk"] <= ks_df["k"])
        .groupBy("k")
        .agg(F.sum("n").alias("covered_tokens"))
    )
    out = cov.crossJoin(F.broadcast(tot)).select(
        "k",
        "covered_tokens",
        "total_tokens",
        F.round(
            F.col("covered_tokens").cast("double") / F.col("total_tokens").cast("double"), 6
        ).alias("coverage"),
        "vocab_size",
    )
    from hashio_spark.caching import track

    return track(out, counts)


def token_entropy(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group unigram token entropy (nats) — the standard diversity /
    degeneracy signal for corpus slices: templated or machine-generated
    slices show low entropy, natural text high.

    Uses the exact-count decomposition H = ln(N) - (1/N)·Σ c·ln(c):
    only one float operation per DISTINCT token, over exact integer
    counts, so the value is reproducible across engines to rounding.

    Scale shape: one explode + (group, token) HashAggregate (map-side
    partials absorb within-doc repetition), then a group-level re-agg of
    the (group, vocab)-sized table.  No window, no join, no Python.
    Output: (group, n_tokens, vocab_size, entropy, entropy_norm) with
    entropy_norm = H / ln(vocab_size) in [0, 1] (0 when vocab <= 1).
    """
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("c"))
    agg = counts.groupBy("grp").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias("_clnc"),
    )
    n = F.col("n_tokens").cast("double")
    h = F.log(n) - F.col("_clnc") / n
    return agg.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "vocab_size",
        F.round(h, 6).alias("entropy"),
        F.round(
            F.when(F.col("vocab_size") > 1, h / F.log(F.col("vocab_size").cast("double"))).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("entropy_norm"),
    )
