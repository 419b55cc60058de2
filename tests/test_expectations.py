"""Deequ-style declarative expectations (operators/expectations.py)."""

import pytest
from pyspark.sql import functions as F

from hashio_spark.operators.expectations import (
    Expectation,
    SchemaField,
    check_schema,
    evaluate_expectations,
    expectation_summary,
)


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, "a", 10, "en"),
        (2, "a", 20, "en"),
        (3, "a", None, "de"),   # null value
        (4, "b", 100, "en"),
        (5, "b", 200, "en"),
    ]
    return spark.createDataFrame(rows, "id long, grp string, v int, lang string")


def test_rules_validate_eagerly():
    with pytest.raises(ValueError):
        Expectation("v", "median", ">=", 1.0)
    with pytest.raises(ValueError):
        Expectation("v", "min", "!=", 1.0)
    with pytest.raises(ValueError):
        Expectation("v", "min", "between", 1.0)
    with pytest.raises(ValueError):
        Expectation("v", "min", ">=", (1.0, 2.0))
    with pytest.raises(ValueError):
        evaluate_expectations(None, [])


def test_per_group_verdicts(table):
    rules = [
        Expectation("v", "completeness", ">=", 1.0),       # fails for grp a
        Expectation("v", "min", ">=", 5.0),
        Expectation("v", "mean", "between", (0.0, 50.0)),  # fails for grp b (150)
        Expectation("lang", "distinct", "<=", 1.0),        # fails for grp a (2)
        Expectation("id", "row_count", ">=", 2.0),
    ]
    out = evaluate_expectations(table, rules, by="grp").collect()
    assert len(out) == 10  # 2 groups x 5 rules
    got = {(r.grp, r.rule_id): r for r in out}
    assert not got[("a", 0)].passed and got[("a", 0)].value == round(2 / 3, 6)
    assert got[("b", 0)].passed and got[("b", 0)].value == 1.0
    assert got[("a", 1)].passed and got[("a", 1)].value == 10.0
    assert got[("a", 2)].passed and got[("a", 2)].value == 15.0
    assert not got[("b", 2)].passed and got[("b", 2)].value == 150.0
    assert not got[("a", 3)].passed and got[("a", 3)].value == 2.0
    assert got[("b", 4)].passed and got[("b", 4)].value == 2.0
    # bounds echoed for lineage
    assert got[("a", 2)].bound_lo == 0.0 and got[("a", 2)].bound_hi == 50.0
    assert got[("a", 1)].bound_hi is None


def test_whole_table_and_summary(table):
    rules = [
        Expectation("id", "row_count", ">=", 5.0),
        Expectation("v", "max", "<=", 50.0),  # fails (200)
    ]
    v = evaluate_expectations(table, rules)
    rows = v.collect()
    assert len(rows) == 2
    s = expectation_summary(v).collect()[0]
    assert s.n_rules == 2 and s.n_failed == 1 and not s.passed
    per_grp = expectation_summary(
        evaluate_expectations(table, rules, by="grp"), by="grp"
    ).collect()
    assert {r.grp: r.n_failed for r in per_grp} == {"a": 1, "b": 2}
    # grp a fails row_count>=5 (3 rows); grp b fails both (2 rows, max 200)


def test_approx_distinct_tier_close(table):
    exact = evaluate_expectations(
        table, [Expectation("lang", "distinct", "<=", 10.0)], by="grp"
    ).collect()
    approx = evaluate_expectations(
        table, [Expectation("lang", "approx_distinct", "<=", 10.0)], by="grp"
    ).collect()
    e = {r.grp: r.value for r in exact}
    a = {r.grp: r.value for r in approx}
    for g in e:
        assert abs(e[g] - a[g]) <= max(1.0, 0.1 * e[g])


def test_check_schema_verdicts(spark, table):
    contract = [
        SchemaField("id", "bigint"),
        SchemaField("grp", "string"),
        SchemaField("v", "double"),          # actual: int → type_mismatch
        SchemaField("missing_col", "string"),
        SchemaField("lang", "string", nullable=False),  # actual nullable
    ]
    got = {r.column: r for r in check_schema(table, contract).collect()}
    assert got["id"].status == "ok" and got["grp"].status == "ok"
    assert got["v"].status == "type_mismatch" and got["v"].actual == "int"
    assert got["missing_col"].status == "missing" and got["missing_col"].actual is None
    assert got["lang"].status == "nullability"
    # strict mode names physical columns the contract omits
    strict = check_schema(table, contract[:2], strict=True).collect()
    unexpected = {r.column for r in strict if r.status == "unexpected"}
    assert unexpected == {"v", "lang"}
    # nested types compare by normalized simpleString (whitespace-insensitive)
    docs = spark.createDataFrame(
        [("d", [("text", "x", None, 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    ok = check_schema(docs, [
        SchemaField("spans", "array< struct<kind:string, text:string, media_ref:string, offset:int> >"),
    ]).collect()[0]
    assert ok.status == "ok"


def test_check_schema_structural_coercion(spark):
    """ADVICE r5: a semantically valid input must not be rejected for
    struct field ORDER or integer WIDTH — consumers access fields by
    name, and bigint offsets are common from other writers."""
    docs = spark.createDataFrame(
        [("d", [("x", None, 7, "text")])],
        # fields reordered AND offset widened to bigint
        "doc_id string, spans array<struct<text:string,media_ref:string,offset:bigint,kind:string>>",
    )
    contract = [
        SchemaField(
            "spans", "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
        ),
    ]
    assert check_schema(docs, contract).collect()[0].status == "ok"
    # a genuinely wrong type still fails
    bad = check_schema(
        docs, [SchemaField("spans", "array<struct<kind:string,text:int,media_ref:string,offset:int>>")]
    ).collect()[0]
    assert bad.status == "type_mismatch"
    # a missing struct field still fails
    bad2 = check_schema(
        docs, [SchemaField("spans", "array<struct<kind:string,text:string,offset:int>>")]
    ).collect()[0]
    assert bad2.status == "type_mismatch"


def test_single_aggregation_pass(table):
    """All rules must compile into ONE aggregate — a corpus-sized input
    is scanned once regardless of rule count."""
    rules = [
        Expectation("v", "min", ">=", 0.0),
        Expectation("v", "max", "<=", 1e9),
        Expectation("v", "mean", "between", (0.0, 1e9)),
        Expectation("v", "completeness", ">=", 0.0),
        Expectation("id", "row_count", ">=", 0.0),
    ]
    plan = (
        evaluate_expectations(table, rules, by="grp")
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    assert len(re.findall(r"\(\d+\) HashAggregate|HashAggregate", plan)) <= 4  # partial+final
    assert "Generate" in plan or "Inline" in plan or "inline" in plan


def test_expectations_match_pandas_model(spark):
    """Property: over randomized small tables, every (slice, rule) verdict
    equals a pandas/python model of the same rounded-metric semantics."""
    import math

    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows_strategy = st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),                      # grp
            st.one_of(st.none(), st.integers(-1000, 1000)),   # v
            st.sampled_from(["en", "de", "fr"]),              # lang
        ),
        min_size=1,
        max_size=25,
    )

    rules = [
        Expectation("v", "completeness", ">=", 0.5),
        Expectation("v", "min", ">=", -100.0),
        Expectation("v", "max", "<=", 100.0),
        Expectation("v", "mean", "between", (-50.0, 50.0)),
        Expectation("lang", "distinct", "<=", 2.0),
        Expectation("v", "row_count", ">=", 2.0),
    ]

    def model(pdf: pd.DataFrame, grp: str):
        g = pdf[pdf.grp == grp]
        n, nv = len(g), g.v.notna().sum()
        vals = [
            round(nv / n, 6),
            round(float(g.v.min()), 6) if nv else None,
            round(float(g.v.max()), 6) if nv else None,
            round(float(g.v.sum()) / nv, 6) if nv else None,
            float(g.lang.nunique()),
            float(n),
        ]
        ok = [
            vals[0] >= 0.5,
            (vals[1] is not None) and vals[1] >= -100.0,
            (vals[2] is not None) and vals[2] <= 100.0,
            (vals[3] is not None) and -50.0 <= vals[3] <= 50.0,
            vals[4] <= 2.0,
            vals[5] >= 2.0,
        ]
        return vals, ok

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(rows_strategy)
    def check(rows):
        df = spark.createDataFrame(rows, "grp string, v long, lang string")
        out = evaluate_expectations(df, rules, by="grp").collect()
        groups = {r[0] for r in rows}
        assert len(out) == len(groups) * len(rules)
        pdf = pd.DataFrame(rows, columns=["grp", "v", "lang"])
        for r in out:
            vals, ok = model(pdf, r.grp)
            want_v, want_ok = vals[r.rule_id], ok[r.rule_id]
            if want_v is None:
                # NULL metric -> hard fail, and passed is BOOLEAN false
                # (not SQL NULL), so summary counts agree with CI gates
                assert r.value is None and r.passed is False
            else:
                assert r.value is not None
                assert math.isclose(r.value, want_v, rel_tol=0, abs_tol=1e-9), (
                    r.rule_id, r.grp, r.value, want_v)
                assert bool(r.passed) == want_ok, (r.rule_id, r.grp)
        # a NULL metric must never count as passed

    check()


def test_null_metric_fails_and_counts_in_summary(spark):
    """All-null slice: value NULL, passed FALSE (not NULL), and the
    failure shows up in expectation_summary / gates."""
    df = spark.createDataFrame([("a", None), ("a", None)], "grp string, v int")
    v = evaluate_expectations(df, [Expectation("v", "min", ">=", 0.0)], by="grp")
    rows = v.collect()
    assert rows[0].value is None and rows[0].passed is False
    s = expectation_summary(v).collect()[0]
    assert s.n_failed == 1 and not s.passed


def test_schema_diff_report(spark):
    from hashio_spark.operators.expectations import schema_diff

    before = spark.createDataFrame([], "a bigint, b string, c int, d string")
    after = spark.createDataFrame([], "a bigint, b int, d string, e double")
    got = {r.column: r for r in schema_diff(before, after).collect()}
    assert set(got) == {"b", "c", "e"}  # a and d unchanged -> omitted
    assert got["b"].change == "type_changed" and got["b"].before == "string" and got["b"].after == "int"
    assert got["c"].change == "removed" and got["c"].after is None
    assert got["e"].change == "added" and got["e"].before is None
    # identical schemas -> empty report
    assert schema_diff(before, before).count() == 0
