"""Custom stateful streaming operators (applyInPandasWithState).

:func:`dedupe_stream` — streaming first-seen dedupe: within each
hash-group, a document whose content digest was already observed in any
earlier micro-batch is dropped.  The streaming analog of the reference's
cache point-lookup skip (``/root/reference/lib/hashio/encoder.py:
406-430``: re-hash only when the cache has no row) — state here is
Spark-managed per-group (checkpointed, exactly-once) instead of a SQLite
table.

Scale notes:
* groups are ``pmod(xxhash64(digest), n_groups)`` buckets, NOT the digest
  itself — state rows per group stay bounded and skew cannot pin one
  hot digest's traffic on one state partition;
* per-group state is a pandas DataFrame of seen digests, Arrow-batched
  both ways (no per-row Python);
* a processing-time timeout expires idle groups so unbounded corpora
  don't grow state forever (configurable; default keeps state);
* per-group state is APPEND-ONLY (no per-batch re-sort — the r02 shape
  rewrote a sorted array every batch, O(|seen| log |seen|) per group per
  batch) and BOUNDED by ``max_state_per_group``: once a group's seen-set
  hits the bound, new digests pass through un-deduped (at-least-once
  dedupe degradation, never an OOM).  At 10^12-doc scale the bound per
  group times ``n_groups`` caps total state memory deterministically;
  raise ``n_groups`` (state shards), not the bound, to scale capacity.
* NULL digests are passed through un-deduped and never enter state
  (a None in the seen array crashed the old sorted() update and made
  pandas isin/duplicated semantics inconsistent — round-2 ADVICE).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

_STATE_SCHEMA = "seen array<string>"


def dedupe_stream(
    stream_docs: DataFrame,
    digest_col: str = "digest",
    n_groups: int = 256,
    timeout_ms: int | None = None,
    max_state_per_group: int = 100_000,
) -> DataFrame:
    """First-seen rows of a streaming DataFrame, keyed by content digest.

    Input must already carry ``digest_col`` (use the digest expressions
    from ``functions.digests`` / ``functions.canonical`` upstream so the
    hashing runs JVM-side).  Output schema == input schema.  Rows with a
    NULL digest always pass through and are never tracked.  When a
    group's state reaches ``max_state_per_group`` digests, further new
    digests are emitted but not tracked (bounded memory; at-least-once
    dedupe beyond the bound).
    """
    out_schema: StructType = stream_docs.schema
    cols = [f.name for f in out_schema.fields]

    def _dedupe(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen_list: list = list(state.get[0]) if state.exists else []
        seen: set = set(seen_list)
        grew = False
        for pdf in pdfs:
            isnull = pdf[digest_col].isna()
            first_idx = ~pdf[digest_col].duplicated(keep="first")
            fresh = pdf[isnull | (first_idx & ~pdf[digest_col].isin(seen))]
            if len(fresh):
                headroom = max_state_per_group - len(seen_list)
                if headroom > 0:
                    add = fresh.loc[~fresh[digest_col].isna(), digest_col].tolist()[:headroom]
                    if add:
                        seen_list.extend(add)  # append-only, never re-sorted
                        seen.update(add)
                        grew = True
                yield fresh[cols]
        if grew or not state.exists:
            state.update((seen_list,))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)

    with_grp = stream_docs.withColumn(
        "_grp", F.pmod(F.xxhash64(F.col(digest_col)), F.lit(n_groups))
    )
    grouped = with_grp.groupBy("_grp")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return grouped.applyInPandasWithState(
        _dedupe,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
