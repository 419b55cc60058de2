"""Sequence packing — assign documents to fixed token-budget training
sequences.

LLM pre-training consumes fixed-length token sequences; feeding one
(padded) document per sequence wastes the budget on padding, so
pipelines pack multiple documents per sequence.  This operator is the
distributed assignment step: every document gets a ``(shard, seq_id,
pos)`` coordinate such that consecutive documents within a shard fill
consecutive ``budget``-token bins.

Semantics (streaming bin assignment): documents are ordered within a
shard by ``order_col``; a document whose exclusive running token total is
``c`` lands in bin ``floor(c / budget)``.  Bin boundaries therefore fall
at exact multiples of the budget and a document may straddle two bins —
the downstream tokenizer splits it at the boundary (standard "packed
dataset" behaviour, cf. T5/GPT-style pretraining loaders).  This is
deliberately NOT first-fit/best-fit bin packing: those need a sequential
reset per bin (inherently iterative), while the streaming rule is a pure
prefix-sum — one window over each shard, embarrassingly parallel across
shards, and reproducible from the (id, token-count) pairs alone.

Scale: the only shuffle is the hash-partition by ``shard``; each shard
sorts independently (no global sort).  Pick ``n_shards`` so one shard's
rows fit a task comfortably — at 10^12 docs and the default hash shard,
n_shards ~ corpus_tokens / (budget · sequences_per_task).  Document-id
hash sharding also randomizes document order per shard, which doubles as
the shuffle step training loaders want.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int,
    shard_expr: Column | None = None,
) -> DataFrame:
    """Add ``(shard, seq_id, pos, cum_before)`` packing coordinates.

    ``shard_expr`` overrides the default ``pmod(xxhash64(id), n_shards)``
    (the oracle twin passes a portable modulo).  ``pos`` is the 1-based
    rank of the document inside its sequence; ``cum_before`` the
    exclusive token prefix within the shard (the document's start offset
    is ``cum_before - seq_id*budget`` into its sequence).
    """
    if budget <= 0 or n_shards <= 0:
        raise ValueError("budget and n_shards must be positive")
    clash = set(docs.columns) & {"shard", "cum_before", "seq_id", "pos"}
    if clash:
        raise ValueError(f"input columns collide with packing outputs: {sorted(clash)}")
    shard = shard_expr if shard_expr is not None else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    d = docs.withColumn("shard", shard.cast("long"))
    # secondary sort on the token count: duplicate ids within a shard
    # would otherwise order by partition layout, making cum_before/seq_id
    # retry-dependent; with (id, tokens) ordering the output MULTISET is
    # deterministic even for fully duplicated rows (which are then
    # interchangeable)
    order = [F.col(id_col).asc(), F.col(tokens_col).asc()]
    w = Window.partitionBy("shard").orderBy(*order)
    cum_before = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    ).cast("long")
    d = d.withColumn("cum_before", cum_before).withColumn(
        "seq_id", F.floor(F.col("cum_before") / F.lit(budget))
    )
    pos = F.row_number().over(Window.partitionBy("shard", "seq_id").orderBy(*order))
    return d.withColumn("pos", pos)


def sequence_manifest(
    packed: DataFrame, tokens_col: str, budget: int | None = None
) -> DataFrame:
    """Per-sequence summary of a :func:`pack_sequences` result:
    ``(shard, seq_id, n_docs, total_tokens, first_doc_cum, last_doc_cum,
    end_cum[, covers_to_seq])`` — the loader-side index of which
    documents build which sequence.

    ``seq_id`` is the bin a document STARTS in, so a document longer than
    the budget spans bins that have no manifest row of their own; such a
    bin is covered by the closest earlier row.  ``end_cum`` (the
    exclusive token end of the group's docs) makes that derivable, and
    passing ``budget`` adds it precomputed as ``covers_to_seq`` — the
    last bin this row's documents reach into (for rows that don't
    straddle, ``covers_to_seq == seq_id``)."""
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).cast("long").alias("total_tokens"),
        F.min("cum_before").alias("first_doc_cum"),
        F.max("cum_before").alias("last_doc_cum"),
        F.max(F.col("cum_before") + F.col(tokens_col)).cast("long").alias("end_cum"),
    ]
    out = packed.groupBy("shard", "seq_id").agg(*aggs)
    if budget is not None:
        out = out.withColumn(
            "covers_to_seq", F.floor((F.col("end_cum") - 1) / F.lit(budget))
        )
    return out
