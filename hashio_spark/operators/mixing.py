"""Corpus-mixing weight solver — the "data mixture" step of a training
pipeline.

Before sampling a 100-TB corpus into a training mix, the pipeline decides
per-stratum (source / language / domain) sampling weights: each stratum
should land at a TARGET share of the mix, but a rare stratum must not be
upweighted past a repetition cap (repeating the same tokens >`cap`×
epochs hurts more than missing the target share).  This operator computes
those weights declaratively:

    weight(s)  = min(cap, target_share(s) / actual_share(s))

and reports the resulting EFFECTIVE shares so the pipeline can assert the
realized mixture before committing a multi-day sampling job.  The weights
feed straight into :func:`hashio_spark.operators.sampling.sample_stratified`
(rate = weight × base_rate) or :func:`sample_weighted`.

Scale shape: ONE hash-aggregate over the corpus (map-side partials,
network O(strata)); everything after operates on strata-sized rows
(a handful to a few thousand), so the totals cross-join is a broadcast
of one row and the renormalization aggregate is trivially small.  The
corpus is scanned exactly once, reading only (strata_col, size_col).

Determinism discipline (same as ``stats.exact_group_corr``): per-stratum
sizes accumulate in decimal(38,0) — exact and associative under any
partitioning — and every floating-point step after that is a fixed tree
of exactly-rounded IEEE-754 ops on exact operands, so shares and weights
are bit-identical across engines.  The effective-share renormalization
sums MICRO-UNIT LONGS (round(w·share·1e6)) instead of raw doubles:
double addition across rows is order-sensitive under shuffle, long
addition is not.

Reference lineage: generalizes the reference's fixed single-rate walk
filtering (``/root/reference/lib/hashio/utils.py:152-209`` filters, one
implicit "keep everything" rate) into the per-stratum rate solver a
corpus-scale pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def mixture_weights(
    df: DataFrame,
    strata_col: str,
    size_col: str,
    targets: dict[str, float] | None = None,
    cap: float = 5.0,
) -> DataFrame:
    """Per-stratum mixing weights toward target shares, with an upweight cap.

    ``targets`` maps stratum value → desired share of the mix; strata not
    listed (or all strata when ``targets`` is None) split the remaining
    mass uniformly.  Returns one row per stratum:

      (stratum, n_rows, total_size, actual_share, target_share,
       weight, capped, effective_share)

    ``weight`` is the multiplicative sampling factor; ``capped`` flags
    strata whose target was unreachable under ``cap``;
    ``effective_share`` is the realized mix share after weighting
    (renormalized — what you actually get, not what you asked for).
    All ratio columns are rounded to 6 decimals.
    """
    sizes = (
        df.groupBy(F.col(strata_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(size_col).cast("decimal(38,0)")).cast("long").alias("total_size"),
        )
    )
    # per-stratum listed share, 0.0 when unlisted — summed over the strata
    # ACTUALLY PRESENT, so a target naming an absent stratum contributes no
    # mass (r4 ADVICE: the Python-side constant Σ targets counted absent
    # strata, leaving target shares summing <1 and unlisted strata
    # under-targeted)
    tgt0 = F.lit(0.0)
    tgt = None
    if targets:
        for value, share in targets.items():
            cond = F.col("stratum") == value
            tgt = F.when(cond, F.lit(float(share))) if tgt is None else tgt.when(cond, F.lit(float(share)))
        tgt0 = tgt.otherwise(F.lit(0.0))
    totals = sizes.agg(
        F.sum(F.col("total_size").cast("decimal(38,0)")).cast("long").alias("_grand"),
        F.count(F.lit(1)).alias("_n_strata"),
        F.sum(
            F.when(F.col("stratum").isin(*targets.keys()), F.lit(1)).otherwise(F.lit(0))
            if targets
            else F.lit(0)
        ).alias("_n_targeted"),
        # micro-unit longs (same discipline as the renormalization sum):
        # exact + order-insensitive under any partitioning
        F.sum(F.round(tgt0 * _MICRO).cast("long")).alias("_listed_mass_u"),
    )

    # explicit target if listed; otherwise the unlisted strata split the
    # remaining (1 - Σ present listed) mass uniformly
    rest = (F.lit(1.0) - F.col("_listed_mass_u").cast("double") / _MICRO) / (
        F.col("_n_strata") - F.col("_n_targeted")
    ).cast("double")
    tgt = rest if tgt is None else tgt.otherwise(rest)

    w = sizes.crossJoin(F.broadcast(totals)).select(
        "stratum",
        "n_rows",
        "total_size",
        (F.col("total_size").cast("double") / F.col("_grand").cast("double")).alias("_actual"),
        tgt.alias("_target"),
    )
    weight = F.least(F.lit(float(cap)), F.col("_target") / F.col("_actual"))
    w = w.select(
        "stratum",
        "n_rows",
        "total_size",
        "_actual",
        "_target",
        weight.alias("_w"),
        # micro-unit longs: exact, associative renormalization basis
        F.round(weight * F.col("_actual") * _MICRO).cast("long").alias("_wshare_u"),
    )
    wtot = w.agg(F.sum("_wshare_u").alias("_wtot"))
    return (
        w.crossJoin(F.broadcast(wtot))
        .select(
            "stratum",
            "n_rows",
            "total_size",
            F.round(F.col("_actual"), 6).alias("actual_share"),
            F.round(F.col("_target"), 6).alias("target_share"),
            F.round(F.col("_w"), 6).alias("weight"),
            (F.col("_w") < F.col("_target") / F.col("_actual")).alias("capped"),
            F.round(
                F.col("_wshare_u").cast("double") / F.col("_wtot").cast("double"), 6
            ).alias("effective_share"),
        )
    )
