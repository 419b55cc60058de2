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
  don't grow state forever (configurable; default keeps state).
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
) -> DataFrame:
    """First-seen rows of a streaming DataFrame, keyed by content digest.

    Input must already carry ``digest_col`` (use the digest expressions
    from ``functions.digests`` / ``functions.canonical`` upstream so the
    hashing runs JVM-side).  Output schema == input schema.
    """
    out_schema: StructType = stream_docs.schema
    cols = [f.name for f in out_schema.fields]

    def _dedupe(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen: set = set(state.get[0]) if state.exists else set()
        new_seen: list = []
        for pdf in pdfs:
            first_idx = ~pdf[digest_col].duplicated(keep="first")
            fresh = pdf[first_idx & ~pdf[digest_col].isin(seen)]
            if len(fresh):
                new_seen.extend(fresh[digest_col].tolist())
                seen.update(fresh[digest_col].tolist())
                yield fresh[cols]
        if new_seen or not state.exists:
            state.update((sorted(seen),))
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
