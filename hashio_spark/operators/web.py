"""URL/domain profiling — which hosts feed the corpus, at what volume.

Web-scale corpora are curated by domain: blocklists, per-domain caps,
licensing audits all start from "how many documents / hits per host".
``domain_profile`` extracts every ``http(s)`` host from a text column
with one ``regexp_extract_all`` (group capture — JVM, codegen), explodes
to (doc, domain) pairs, and aggregates hits + distinct documents per
domain.  The aggregation is algebraic (map-side partials), so the only
shuffle is domain-keyed and carries one row per (input partition,
domain); top-N is TakeOrderedAndProject.  Hosts are lowercased
(RFC 4343 case-insensitivity) but otherwise raw — no IDN/punycode
normalization.

``domain_filter`` is the blocklist gate: drop (or keep) documents whose
text references any listed domain, via the same extraction against a
broadcast-joined list — ``how='left_anti'`` removes offenders.

Scale note: a hot domain (half the corpus links one CDN) skews nothing
here — hits are summed, never collected; distinct docs use the same
grouped count because a (doc, domain) pair appears once per mention and
is deduplicated pre-shuffle by the partial distinct.

Beyond-reference operator; registered under the oracle as
``domain_counts``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# capture group 1 = the host; RE2/java.util.regex-portable
URL_HOST_RE = r"https?://([A-Za-z0-9.-]+)"


def extracted_domains(col) -> "F.Column":
    """array<string> of lowercased hosts mentioned in ``col``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.regexp_extract_all(c, F.lit(URL_HOST_RE), 1), lambda d: F.lower(d)
    )


def domain_profile(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    top_n: int | None = None,
) -> DataFrame:
    """Per-domain (domain, n_hits, n_docs), hottest first; ``top_n``
    limits via per-partition heaps (no global sort)."""
    pairs = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(extracted_domains(col)).alias("domain"),
    )
    prof = pairs.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.countDistinct("_doc").alias("n_docs"),
    )
    ordered = prof.orderBy(F.desc("n_hits"), "domain")
    return ordered.limit(top_n) if top_n else ordered


def domain_filter(
    df: DataFrame,
    blocklist: Sequence[str] | DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    keep: bool = False,
) -> DataFrame:
    """Drop rows mentioning any blocklisted domain (``keep=True``
    inverts: retain only those rows).  The blocklist joins broadcast —
    it is curation metadata, thousands of rows at most.  Offender ids
    are resolved on a (id, domain) projection, then semi/anti-joined
    back on ``id_col`` alone — so NULLs in unrelated columns can never
    leak a row through the filter.  Rows whose text mentions no URL at
    all are untouched by definition (no extracted pair to match)."""
    spark = df.sparkSession
    if not isinstance(blocklist, DataFrame):
        blocklist = spark.createDataFrame(
            [(d.lower(),) for d in blocklist], "domain string"
        )
    else:
        blocklist = blocklist.select(F.lower(F.col("domain")).alias("domain"))
    offenders = (
        df.select(
            F.col(id_col).alias("_bid"),
            F.explode(extracted_domains(col)).alias("_dom"),
        )
        .join(F.broadcast(blocklist), F.col("_dom") == F.col("domain"), "left_semi")
        .select("_bid")
    )
    how = "left_semi" if keep else "left_anti"
    return df.join(offenders, df[id_col] == offenders["_bid"], how)
