"""Deterministic hash-based sampling — the data-mixing primitive.

Training-data pipelines weight sources/languages by sampling each
stratum at its own rate.  ``df.sample()`` is seed-dependent on partition
layout (a repartition changes which rows survive) and ``TABLESAMPLE`` is
engine-specific; a HASH-gate — keep a row iff ``uniform(hash(key)) <
rate(stratum)`` — is layout-independent, reproducible across engines and
re-runs, needs no shuffle (a per-row filter the scan can evaluate), and
composes: raising a stratum's rate later keeps a SUPERSET of the earlier
sample (the gate is monotone in the rate).

Two hash tiers, same contract as the digest family:
* ``method="xxhash64"`` — native JVM hash, the scale path;
* ``method="md5"`` — 60-bit prefix of md5, bit-replicable in any SQL
  engine (the oracle-parity twin; same trick as ``simhash_md5``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = 1_000_000


def hash_long(key_col: Column | str, seed: str = "s42", method: str = "xxhash64") -> Column:
    """Full-width deterministic key hash (64-bit signed for xxhash64,
    60-bit positive for the md5 oracle tier) — the collision-resistant
    form for ORDERING by hash.  ``hash_uniform``'s mod-1e6 residue is
    fine as a sampling gate but has ~n/1e6 collisions per value at scale
    (r4 ADVICE: 10^6 colliding rows per shard at 10^12 rows collapses a
    hash-order to its key tiebreak)."""
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    if method == "xxhash64":
        return F.xxhash64(k.cast("string"), F.lit(seed))
    if method == "md5":
        return F.conv(
            F.substring(F.md5(F.concat(k.cast("string"), F.lit(seed)).cast("binary")), 1, 15), 16, 10
        ).cast("long")
    raise ValueError(f"unknown hash method: {method}")


def hash_uniform(key_col: Column | str, seed: str = "s42", method: str = "xxhash64") -> Column:
    """Uniform-in-[0,1) pseudo-random value derived from a key column —
    stable across runs, partitionings, and engines (md5 tier)."""
    return F.pmod(hash_long(key_col, seed, method), F.lit(_DENOM)) / F.lit(float(_DENOM))


def sample_stratified(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "s42",
    method: str = "xxhash64",
) -> DataFrame:
    """Keep each row iff its key-hash uniform < its stratum's rate.

    ``rates`` maps stratum value → keep probability; unlisted strata use
    ``default_rate``.  Pure per-row filter: no shuffle, pushes past
    column pruning, and the expected output size is Σ n_s·rate_s at any
    scale."""
    rate = None
    for value, r in rates.items():
        cond = F.col(strata_col) == value
        rate = F.when(cond, F.lit(float(r))) if rate is None else rate.when(cond, F.lit(float(r)))
    rate = F.lit(float(default_rate)) if rate is None else rate.otherwise(F.lit(float(default_rate)))
    return df.filter(hash_uniform(key_col, seed, method) < rate)


def sample_weighted(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    expected_k: int,
    group_col: str | None = None,
    seed: str = "s42",
    method: str = "xxhash64",
) -> DataFrame:
    """Probability-proportional-to-size Poisson sample: keep a row iff
    ``uniform(hash(key)) * W < expected_k * w`` where ``w`` is the row's
    integer weight and ``W`` the (per-group) weight total — inclusion
    probability ``min(1, k·w/W)``, expected sample size ≈ ``expected_k``
    per group.  Long documents are proportionally more likely to survive,
    the usual size-biased mixing gate for training corpora.

    Why this formulation and not Efraimidis-Spirakis (``u^(1/w)`` top-k):
    the A-ES priority needs ``pow``/``ln``, whose last-ulp values differ
    across libm implementations, so two engines can rank near-ties
    differently — a reproducibility hazard.  Here every float op is
    IEEE-754 exactly-rounded (multiply, compare): hash uniform and the
    decimal-exact weight total produce bit-identical keep decisions in
    ANY engine (the md5 tier is the oracle-parity twin).

    Scale: one hash-aggregate for the totals (O(groups) rows, broadcast
    back), then a pure per-row filter — no sort, no top-k shuffle; the
    weight total accumulates in decimal(38,0) so 10^12 rows × large
    weights cannot overflow or drift."""
    w = F.col(weight_col).cast("long")
    u = hash_uniform(key_col, seed, method)
    if group_col is None:
        tot = df.select(F.sum(w.cast("decimal(38,0)")).alias("_wtot"))
        j = df.crossJoin(F.broadcast(tot))
    else:
        tot = df.groupBy(group_col).agg(F.sum(w.cast("decimal(38,0)")).alias("_wtot"))
        j = df.join(F.broadcast(tot), group_col)
    keep = (u * F.col("_wtot").cast("double")) < (
        (F.lit(int(expected_k)) * w).cast("double")
    )
    return j.filter(keep).drop("_wtot")


def split_expr(
    key_col: Column | str,
    bounds: tuple[tuple[float, str], ...] = ((0.8, "train"), (0.9, "valid")),
    default: str = "test",
    seed: str = "s42",
    method: str = "xxhash64",
) -> Column:
    """Deterministic split label as a pure per-row expression: threshold
    bands over the key-hash uniform (default 80/10/10 train/valid/test).
    Disjoint-exhaustive by construction (bands partition [0,1)), stable
    across runs, partitionings, and engines (md5 tier) — and, crucially,
    a pure FUNCTION of the key: any table carrying the key can be
    labeled without joining back to the corpus."""
    u = hash_uniform(key_col, seed, method)
    expr = F.lit(default)
    for upper, label in reversed(bounds):
        expr = F.when(u < upper, F.lit(label)).otherwise(expr)
    return expr


def split_leakage(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    bounds: tuple[tuple[float, str], ...] = ((0.8, "train"), (0.9, "valid")),
    default: str = "test",
    seed: str = "s42",
    method: str = "xxhash64",
) -> DataFrame:
    """Audit near-duplicate leakage across train/valid/test boundaries:
    given a near-dup pair table (e.g. LSH candidates or Jaccard-verified
    pairs), label both sides with :func:`split_expr` and count the pairs
    whose endpoints fall in DIFFERENT splits — the train→eval
    contamination that survives per-split dedupe (each split is
    internally deduped but duplicates CROSSING the boundary leak eval
    answers into training).

    Returns one row per unordered split pair: (split_a, split_b,
    n_pairs, n_docs) with split_a < split_b lexically, n_docs = distinct
    documents involved.

    Scale: because the split is a pure key function there is NO join
    against the 10^12-row corpus — the audit costs a per-row projection
    on the (much smaller) pair table plus one hash-aggregate; the
    distinct-doc count shuffles only the cross-split doc ids."""
    sa = split_expr(F.col(a_col), bounds, default, seed, method)
    sb = split_expr(F.col(b_col), bounds, default, seed, method)
    cross = (
        pairs.select(
            sa.alias("_sa"), sb.alias("_sb"), F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
        )
        .filter(F.col("_sa") != F.col("_sb"))
        .select(
            F.least("_sa", "_sb").alias("split_a"),
            F.greatest("_sa", "_sb").alias("split_b"),
            "_a", "_b",
        )
    )
    docs = cross.select(
        "split_a", "split_b", F.explode(F.array("_a", "_b")).alias("_doc")
    )
    return docs.groupBy("split_a", "split_b").agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_pairs"),
        F.countDistinct("_doc").alias("n_docs"),
    )
