"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship validation pass (stats + constraints + span
digests) on the interleaved-document table derived from sf0.001.
``queries``/``oracle_sql`` expose every SQL-expressible operator from
SURVEY.md §2 plus the training-data ops (dedupe/minhash/similarity/text
analysis/drift); implementations live in ``hashio_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hashio_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full validation pass over interleaved docs at sf0.001."""
    from hashio_spark.queries import validate_interleaved

    return validate_interleaved(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
