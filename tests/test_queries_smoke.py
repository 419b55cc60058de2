"""Every registry query runs at sf0.001 and yields a well-formed result.
(Value-level correctness vs DuckDB is enforced by tools/oracle_check.py
and the driver's CORRECTNESS gate at sf0.01.)"""

import duckdb
import pytest

from hashio_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, name):
    fn, _sql = REGISTRY[name]
    df = fn(spark, SF)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
    assert len(set(df.columns)) == len(df.columns), "duplicate column names"


def test_registry_unattested_queries_run_first():
    """The driver's correctness gate is wall-time-budgeted and truncates in
    REGISTRY iteration order (round 4 stopped at entry 50 of 85): queries
    without a prior driver attestation must come before the already-green
    ones so a truncation costs re-attestation, never first attestation."""
    from hashio_spark.queries import _DRIVER_ATTESTED_R4

    order = list(REGISTRY)
    n_new = len(order) - len(_DRIVER_ATTESTED_R4 & set(order))
    assert n_new > 0
    assert not (set(order[:n_new]) & _DRIVER_ATTESTED_R4), (
        "driver-attested query scheduled before an unattested one"
    )


def test_oracle_sql_parses_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    for name, (_fn, sql) in REGISTRY.items():
        if sql is None:
            continue
        cur = con.execute(sql)
        cur.fetchall()


def test_spark_and_oracle_columns_match(spark):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    for name, (fn, sql) in REGISTRY.items():
        if sql is None:
            continue
        s_cols = sorted(fn(spark, SF).columns)
        d_cols = sorted(c[0] for c in con.execute(sql).description)
        assert s_cols == d_cols, f"{name}: spark={s_cols} duck={d_cols}"
