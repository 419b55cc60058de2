"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin
family, public literature: Bayardo et al. WWW'07, Xiao et al. WWW'08).

The LSH paths (``operators/dedupe.py``, ``operators/similarity.py``)
trade recall for speed; this operator is their EXACT complement: every
pair with Jaccard ≥ τ, no probabilistic misses, still never all-pairs.
The pruning lemma: order each set's tokens by global rarity (document
frequency asc, token asc — one total order for the whole corpus); two
sets with J ≥ τ MUST share a token inside their length
``n - ceil(τ·n) + 1`` prefixes.  Candidates therefore come from an
equi-join on PREFIX tokens only — and because prefixes hold each set's
globally rarest tokens, the join keys are precisely the tokens with the
smallest buckets.  Stopword-class tokens (huge document frequency)
sort last and essentially never enter a prefix: the natural skew killer
for this join shape.

Plan shape: two token-keyed shuffles (document frequency + the
prefix-token candidate join), one id-keyed aggregation to order each
set, and an exact ``array_intersect`` verify on candidate pairs.
Every token-keyed stage runs on ``xxhash64`` of the token — 8-byte
shuffle keys instead of shingle strings (see the inline proof that
collisions cannot change the verified output).
Per-doc state is the doc's own token set (``collect_list`` bounded by
document size, not corpus size).  For corpora whose token universe is
still too hot (tiny vocab), ``max_token_bucket`` caps the per-token
candidate bucket like the LSH band cap — an explicit, documented
recall trade, off by default because the operator's contract is EXACT.

Empty sets match nothing (Jaccard with an empty set is undefined; the
reference point ``J(∅,∅)`` is conventionally excluded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_join(
    df: DataFrame,
    id_col: str,
    set_col: str,
    threshold: float,
    max_token_bucket: int | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """All pairs (id_a, id_b, jaccard) with exact Jaccard ≥ ``threshold``
    between the distinct-token sets of ``set_col`` (array<string>).
    ``id_a < id_b``; each unordered pair appears once."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    if max_token_bucket is not None and max_token_bucket < 1:
        raise ValueError("max_token_bucket must be >= 1")

    # the (id, set) projection feeds THREE consumers (token explode +
    # both verify sides); without the persist Catalyst recomputes the
    # upstream set construction per consumer.  Handle tracked on the
    # result; release via hashio_spark.caching.release(result).
    base = (
        df.select(F.col(id_col).alias("_id"), F.array_distinct(F.col(set_col)).alias("_set"))
        .filter(F.size("_set") > 0)
        .persist()
    )
    # token identity is xxhash64 from here on: the document-frequency
    # shuffle, the per-set ordering agg, and the candidate join all move
    # 8-byte longs instead of shingle strings (the corpus's dominant
    # byte volume).  Collisions only MERGE hashed tokens, which can only
    # grow intersections / shrink unions, so J_hashed >= J_real — every
    # real pair with J >= tau still satisfies the prefix lemma on the
    # hashed sets, and the exact array_intersect verify below runs on
    # the REAL sets, so collisions cannot add a wrong output row either.
    # (The rarity tiebreak becomes (df, hash) instead of (df, string) —
    # any one total order is valid for the lemma; candidates may differ,
    # verified output cannot.)
    toks = base.select(
        "_id",
        F.explode(F.array_distinct(F.transform("_set", lambda t: F.xxhash64(t)))).alias("_tok"),
    )
    dfreq = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_dfq"))

    # per-set rarity order WITHOUT a global rank structure: sorting each
    # set's (df, token-hash) structs gives the same total order everywhere
    ordered = (
        toks.join(dfreq, "_tok")
        .groupBy("_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("_dfq", "_tok"))).alias("_o"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    n = F.col("_n")
    plen = (n - F.ceil(F.lit(float(threshold)) * n) + 1).cast("int")
    prefix = ordered.select(
        "_id", "_n", F.explode(F.slice("_o", 1, plen)).alias("_p")
    ).select("_id", "_n", F.col("_p._tok").alias("_tok"))
    if max_token_bucket is not None:
        keep = (
            prefix.groupBy("_tok")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") <= max_token_bucket)
            .select("_tok")
        )
        prefix = prefix.join(keep, "_tok", "left_semi")

    # size-ratio pruning: J >= tau forces tau·|A| <= |B| <= |A|/tau, so
    # mismatched-length pairs die inside the join, before the distinct
    tau = F.lit(float(threshold))
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._tok") == F.col("b._tok"))
            & (F.col("a._id") < F.col("b._id"))
            & (F.col("a._n") >= tau * F.col("b._n"))
            & (F.col("b._n") >= tau * F.col("a._n")),
        )
        .select(F.col("a._id").alias("_ida"), F.col("b._id").alias("_idb"))
        .distinct()
    )
    sa = base.select(F.col("_id").alias("_ida"), F.col("_set").alias("_sa"))
    sb = base.select(F.col("_id").alias("_idb"), F.col("_set").alias("_sb"))
    n_int = F.size(F.array_intersect("_sa", "_sb"))
    jac = n_int.cast("double") / (F.size("_sa") + F.size("_sb") - n_int).cast("double")
    out = (
        cand.join(sa, "_ida")
        .join(sb, "_idb")
        .select(F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"), jac.alias("_jac"))
        .filter(F.col("_jac") >= F.lit(float(threshold)))
    )
    jcol = F.round(F.col("_jac"), round_to) if round_to is not None else F.col("_jac")
    from hashio_spark.caching import track

    return track(out.select("id_a", "id_b", jcol.alias("jaccard")), base)
