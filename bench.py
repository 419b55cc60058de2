"""Benchmark harness (driver-run per round → BENCH_r{N}.json).

Headline metric: docs/sec through the flagship validation pass (full
stats + constraint + digest, BASELINE.json) over a deterministic
synthetic interleaved-document table (datagen, seed 42 — no external
data), plus wall-times for the catalog queries at $SPARK_GRAFT_SF_DIR.

Scaling-efficiency proxy (BASELINE.md: no real cluster in-sandbox): the
same validation job at local[N/4] and local[N] on the same input;
efficiency = (T_small / T_big) / 4 — reported in the JSON line and
mirrored into BENCH/BASELINE.md by the build notes.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "flagship": {...}, "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "2000000"))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "top_revenue_customers",
    "stats_summary",
    "composite_digest",
    "dedupe_exact",
    "dedupe_minhash_lsh",
    "verify_manifest",
    "snapshot_diff",
    "drift_psi",
    "ann_cosine_topk",
    "validate_interleaved",
]


_DOCS_PATH = "/tmp/hashio_spark_bench_docs.parquet"


def _materialize_docs(n_docs: int) -> None:
    """One-time: write the deterministic synthetic table to parquet so the
    measured job validates a table-resident dataset (the north-rule input
    is an Iceberg table, not a generator expression)."""
    from hashio_spark.datagen import documents_interleaved
    from hashio_spark.session import get_spark

    if os.path.exists(_DOCS_PATH + "/_SUCCESS") and os.environ.get("BENCH_REUSE_DOCS") == "1":
        return
    spark = get_spark(app="bench-datagen", cores=CPUS)
    try:
        docs = documents_interleaved(spark, n_docs=n_docs, n_partitions=64)
        docs.write.mode("overwrite").parquet(_DOCS_PATH)
    finally:
        spark.stop()


def _run_validation(n_executors: int, exec_cores: int = 8, algo: str = "fast") -> float:
    """Run the flagship validation on a local-cluster of ``n_executors``
    JVMs × ``exec_cores`` threads over the materialized table; returns
    min-of-3 wall seconds after one warmup pass.

    Topology notes (see BENCH.md):
    * multi-JVM executors are the honest proxy for the north rule's
      "N vs 4N executors" AND keep each JVM under this sandbox's
      safepoint-stall thread knee (>16 threads/JVM is pathological here);
    * warmup amortizes C2/codegen compile (one-time per executor JVM);
    * min-of-3 filters hypervisor vCPU-starvation outliers.
    """
    from pyspark.sql import SparkSession

    from hashio_spark.datagen import asset_catalog
    from hashio_spark.plans.validate import validate

    spark = (
        SparkSession.builder.master(f"local-cluster[{n_executors},{exec_cores},12288]")
        .appName(f"bench-validate-{n_executors}x{exec_cores}")
        .config("spark.sql.shuffle.partitions", str(max(n_executors * exec_cores, 64)))
        # NB: local-cluster's third arg is only the WORKER capacity;
        # executors still size from spark.executor.memory (default 1g)
        .config("spark.executor.memory", "10g")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(_DOCS_PATH)
        cat = asset_catalog(spark, 1000)

        def one_pass() -> float:
            t0 = time.monotonic()
            res = validate(docs, cat, algo=algo)
            res.report.collect()  # forces stats agg + violation union (persisted)
            res.violations.count()
            dt = time.monotonic() - t0
            res.violations.unpersist()
            return dt

        one_pass()  # warmup: JIT + page cache
        return min(one_pass() for _ in range(3))
    finally:
        spark.stop()


def main() -> None:
    from hashio_spark.queries import REGISTRY
    from hashio_spark.session import get_spark

    out: dict = {"sf": SF_DIR, "unit": "sec"}
    qtimes: dict[str, float] = {}

    spark = get_spark(app="bench", cores=CPUS)
    for name in BENCH_QUERIES:
        fn, _sql = REGISTRY[name]
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        n = df.count()
        qtimes[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {qtimes[name]}s rows={n}", file=sys.stderr)
    spark.stop()

    # flagship throughput: N vs 4N executor JVMs (8 cores each)
    _materialize_docs(N_DOCS)
    exec_cores = 8
    n_small, n_big = max(1, CPUS // 32), max(1, CPUS // 8)
    t_big = _run_validation(n_big, exec_cores)
    docs_per_sec = N_DOCS / t_big
    t_small = _run_validation(n_small, exec_cores)
    efficiency = (t_small / t_big) / (n_big / n_small)
    small = n_small * exec_cores
    CPUS_big = n_big * exec_cores

    out["metric"] = "docs/sec validated (full stats+constraint+digest pass)"
    out["queries"] = qtimes
    out["flagship"] = {
        "n_docs": N_DOCS,
        "executors": f"{n_big}x{exec_cores}",
        "cores": CPUS_big,
        "seconds": round(t_big, 3),
        "docs_per_sec": round(docs_per_sec, 1),
    }
    out["scaling"] = {
        "executors_small": f"{n_small}x{exec_cores}",
        "executors_big": f"{n_big}x{exec_cores}",
        "cores_small": small,
        "cores_big": CPUS_big,
        "seconds_small": round(t_small, 3),
        "seconds_big": round(t_big, 3),
        "throughput_small_docs_per_sec": round(N_DOCS / t_small, 1),
        "throughput_big_docs_per_sec": round(docs_per_sec, 1),
        "efficiency": round(efficiency, 3),
        "method": "local-cluster N vs 4N executor JVMs, warmup + min-of-3 (see BENCH.md)",
    }
    out["value"] = round(sum(qtimes.values()) + t_big, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
