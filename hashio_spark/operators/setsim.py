"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin
family, public literature: Bayardo et al. WWW'07, Xiao et al. WWW'08).

The LSH paths (``operators/dedupe.py``, ``operators/similarity.py``)
trade recall for speed; this operator is their near-exact complement:
every pair with Jaccard ≥ τ, no LSH-style recall loss, still never
all-pairs.  The pruning lemma: order each set's tokens by global rarity
(document frequency asc, token asc — one total order for the whole
corpus); two sets with J ≥ τ MUST share a token inside their length
``n - ceil(τ·n) + 1`` prefixes.  Candidates therefore come from an
equi-join on PREFIX tokens only — and because prefixes hold each set's
globally rarest tokens, the join keys are precisely the tokens with the
smallest buckets.  Stopword-class tokens (huge document frequency)
sort last and essentially never enter a prefix: the natural skew killer
for this join shape.

Token identity is ``xxhash64`` end to end: sets are materialized ONCE
as distinct 8-byte hash arrays and every stage — document frequency,
per-set ordering, the prefix candidate join, and the verify
intersection — runs on longs instead of shingle strings (the corpus's
dominant byte volume; measured 3× less verify shuffle at sf1.0).

CONTRACT (honest form — ADVICE r5): the output is exact MODULO 64-bit
hash collisions.  A collision between two distinct tokens can perturb
document frequencies, prefix membership, and the verified Jaccard value
itself (two colliding tokens inside one set collapse to one element).
For a corpus with V distinct tokens the probability any collision
exists at all is ≤ V²/2⁶⁵ (≈ 3×10⁻¹¹ at V = 10⁴·⁵, ≈ 0.03 at V = 10⁹);
below that threshold every emitted pair and Jaccard value is identical
to the string-exact result.  Callers needing unconditional exactness at
extreme vocabularies should hash to ``struct(xxhash64(t), t)`` instead
(restoring string-width shuffles); the operator keeps the 8-byte form
because its probabilistic guarantee is far stronger than the LSH recall
it complements, at a fraction of the cost.

Plan shape: two token-keyed shuffles (document frequency + the
prefix-token candidate join), one id-keyed aggregation to order each
set, and an exact ``array_intersect`` verify on candidate pairs.  The
candidate join also applies the PPJoin positional filter — a matching
token at 1-based rarity positions (pa, pb) bounds the overlap by
``min(pa, pb) + min(|A|-pa, |B|-pb)``, so pairs that cannot reach the
τ-implied overlap ``ceil(τ/(1+τ)·(|A|+|B|))`` die inside the join.
Candidate multiplicity (one row per shared prefix token) is NOT
deduplicated before the verify: measured at sf1.0 the duplicates are
~2% of candidates while the distinct costs a full extra shuffle of the
candidate set; the verify output (tiny by construction) is deduplicated
instead.  Per-doc state is the doc's own token set (``collect_list``
bounded by document size, not corpus size).  For corpora whose token
universe is still too hot (tiny vocab), ``max_token_bucket`` caps the
per-token candidate bucket like the LSH band cap — an explicit,
documented recall trade, off by default.

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
    """All pairs (id_a, id_b, jaccard) with Jaccard ≥ ``threshold``
    between the distinct-token sets of ``set_col`` (array<string>),
    exact modulo 64-bit token-hash collisions (see module docstring).
    ``id_a < id_b``; each unordered pair appears once."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    if max_token_bucket is not None and max_token_bucket < 1:
        raise ValueError("max_token_bucket must be >= 1")

    # the (id, hashed-set) projection feeds THREE consumers (token
    # explode + both verify sides); without the persist Catalyst
    # recomputes the upstream set construction per consumer.  Handle
    # tracked on the result; release via hashio_spark.caching.release.
    #
    # Deliberately NO emptiness filter here: empty sets are inert by
    # construction (no tokens → never in toks/prefix → never a candidate
    # → never joined in the verify), while an explicit
    # ``filter(size(_hs) > 0)`` gets predicate-pushed below the staged
    # projections, which INLINES the whole hash/shingle expression tree
    # into a scan-side condition — higher-order lambdas are interpreted
    # with no subexpression reuse, so an inlined upstream tokenization
    # re-executes per array ELEMENT, and the pushed filter lands below
    # any fan-out exchange (measured: 1.2 s → 31 s for the base
    # materialization at sf1.0).
    base = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.transform(F.col(set_col), lambda t: F.xxhash64(t))).alias("_hs"),
    ).persist()
    toks = base.select("_id", F.explode("_hs").alias("_tok"))
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
    # Two prefix tiers per set (AllPairs/PPJoin asymmetry, Xiao et al.
    # WWW'08): every set is INDEXED under its first n - ceil(τ·n) + 1
    # tokens (valid vs any partner, since τ·|A| ≤ |B| forces overlap ≥
    # ceil(τ·n)); but when a set PROBES against partners at least as
    # large, the overlap bound tightens to ceil(2τ/(1+τ)·n), so the
    # probing side only needs its first n - ceil(2τ/(1+τ)·n) + 1 tokens
    # (~45% shorter at τ=0.8).  Ordering pairs by (size, id) lets the
    # smaller side always probe: join volume per token bucket drops from
    # |index|² to |probe|·|index|.  Every float ceil carries a -1e-9
    # bias so rounding can only LENGTHEN a prefix (extra candidates),
    # never shorten one (a lost pair).
    n = F.col("_n")
    tau = F.lit(float(threshold))
    plen_index = (n - F.ceil(tau * n - F.lit(1e-9)) + 1).cast("int")
    probe_frac = F.lit(2.0 * float(threshold) / (1.0 + float(threshold)))
    plen_probe = (n - F.ceil(probe_frac * n - F.lit(1e-9)) + 1).cast("int")
    prefix = ordered.select(
        "_id", "_n", plen_probe.alias("_pp"),
        F.posexplode(F.slice("_o", 1, plen_index)).alias("_pos0", "_p"),
    ).select(
        "_id", "_n", "_pp", (F.col("_pos0") + 1).alias("_pa"), F.col("_p._tok").alias("_tok")
    )
    if max_token_bucket is not None:
        keep = (
            prefix.groupBy("_tok")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") <= max_token_bucket)
            .select("_tok")
        )
        prefix = prefix.join(keep, "_tok", "left_semi")

    # probe side: only rows inside the short probing prefix
    probe = prefix.filter(F.col("_pa") <= F.col("_pp"))

    # size-ratio pruning (one-sided — the probe side is never larger),
    # and the PPJoin positional filter: a match at rarity positions
    # (pa, pb) caps the overlap at min(pa,pb) + min(na-pa, nb-pb) —
    # tokens before the match contribute at most min(pa,pb)-1, the match
    # 1, the suffixes at most min(na-pa, nb-pb).  A true pair's every
    # matching row satisfies the bound (it upper-bounds the REAL overlap
    # ≥ the τ-implied requirement τ·(na+nb)/(1+τ)), so per-row pruning
    # drops no pair; the 1e-9 slack keeps float rounding from ever
    # false-pruning an integer-exact boundary case.
    a, b = probe.alias("a"), prefix.alias("b")
    na, nb = F.col("a._n"), F.col("b._n")
    pa, pb = F.col("a._pa"), F.col("b._pa")
    ubound = (F.least(pa, pb) + F.least(na - pa, nb - pb)).cast("double")
    cand = a.join(
        b,
        (F.col("a._tok") == F.col("b._tok"))
        & ((na < nb) | ((na == nb) & (F.col("a._id") < F.col("b._id"))))
        & (na >= tau * nb)
        & (ubound * (F.lit(1.0) + tau) >= tau * (na + nb).cast("double") - F.lit(1e-9)),
    ).select(
        F.least(F.col("a._id"), F.col("b._id")).alias("_ida"),
        F.greatest(F.col("a._id"), F.col("b._id")).alias("_idb"),
    )
    sa = base.select(F.col("_id").alias("_ida"), F.col("_hs").alias("_sa"))
    sb = base.select(F.col("_id").alias("_idb"), F.col("_hs").alias("_sb"))
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

    # candidate multiplicity survives to here (one row per shared prefix
    # token); dedupe the TINY verified output instead of the huge
    # candidate set — values are identical per pair, so distinct() is a
    # set operation on the final rows.
    return track(out.select("id_a", "id_b", jcol.alias("jaccard")).distinct(), base)
