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


def hash_uniform(key_col: Column | str, seed: str = "s42", method: str = "xxhash64") -> Column:
    """Uniform-in-[0,1) pseudo-random value derived from a key column —
    stable across runs, partitionings, and engines (md5 tier)."""
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    if method == "xxhash64":
        h = F.xxhash64(k.cast("string"), F.lit(seed))
    elif method == "md5":
        h = F.conv(
            F.substring(F.md5(F.concat(k.cast("string"), F.lit(seed)).cast("binary")), 1, 15), 16, 10
        ).cast("long")
    else:
        raise ValueError(f"unknown hash method: {method}")
    return F.pmod(h, F.lit(_DENOM)) / F.lit(float(_DENOM))


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
