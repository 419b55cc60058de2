"""PII pattern scrubbing — sequential regex redaction, all JVM-side.

A training-data pipeline must strip personally-identifying strings
before a corpus ships; at 100 TB that has to be expression-level work
(`regexp_replace` inside whole-stage codegen), never a Python UDF.
This operator applies an ORDERED pattern registry — order is part of
the contract, because later patterns see the earlier patterns'
replacement tokens (e.g. the SSN rule must run before the greedy
phone rule or the phone rule swallows ``123-45-6789`` first).

Per-pattern hit counts are computed on the text state *entering* that
stage (``size(regexp_extract_all(...))``) so counts and replacements
describe the same match set.  Patterns stick to the regex subset with
identical semantics in java.util.regex and RE2 (character classes,
``\\b``, bounded repeats; no lookaround, no backreferences) so the
DuckDB oracle can replay them verbatim — and so the operator stays
portable to engines that compile regexes to DFAs.

Scale shape: pure per-row narrow work — no shuffle, no state; Catalyst
folds the chained replaces into one codegen'd projection.

Beyond-reference operator (the reference digests bytes, it never
rewrites content); registered under the oracle as ``pii_redact``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, regex, replacement token) — ORDER MATTERS (see module docstring)
DEFAULT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def redact(
    df: DataFrame,
    col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PATTERNS,
    out_col: str | None = None,
    with_counts: bool = True,
) -> DataFrame:
    """Append ``out_col`` (default ``{col}_redacted``) with every pattern
    replaced by its token, plus ``n_{name}`` hit-count columns when
    ``with_counts``.  NULL text yields NULL output and NULL counts."""
    out_col = out_col or f"{col}_redacted"
    names = [n for n, _, _ in patterns]
    if len(set(names)) != len(names):
        raise ValueError("duplicate pattern names")
    clash = set(df.columns) & ({out_col} | {f"n_{n}" for n in names})
    if clash:
        raise ValueError(f"output columns collide with input: {sorted(clash)}")
    stage: Column = F.col(col)
    counts: list[Column] = []
    for name, pat, token in patterns:
        if with_counts:
            counts.append(
                F.size(F.regexp_extract_all(stage, F.lit(pat), 0)).alias(f"n_{name}")
            )
        stage = F.regexp_replace(stage, pat, token)
    return df.select("*", stage.alias(out_col), *counts)
