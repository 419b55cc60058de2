"""Exact prefix-filtered Jaccard join (operators/setsim.py) vs a
brute-force all-pairs oracle."""

import itertools
import random

import pandas as pd
import pytest

from hashio_spark.operators.setsim import jaccard_join


def _brute(rows, tau):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        A, B = set(sa), set(sb)
        if not A or not B:
            continue
        j = len(A & B) / len(A | B)
        if j >= tau:
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            out.add((lo, hi, round(j, 6)))
    return out


def _run(spark, rows, tau, **kw):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "s"]))
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_join(df, "id", "s", tau, **kw).collect()
    }
    return got


def test_matches_brute_force_handpicked(spark):
    rows = [
        ("a", ["x", "y", "z"]),
        ("b", ["x", "y", "z", "w"]),   # J(a,b) = 3/4
        ("c", ["x", "y"]),             # J(a,c) = 2/3, J(b,c) = 2/4
        ("d", ["p", "q"]),             # disjoint
        ("e", []),                     # empty: matches nothing
        ("f", ["x", "y", "z"]),        # identical to a -> J = 1
    ]
    for tau in (0.5, 0.66, 0.75, 1.0):
        assert _run(spark, rows, tau) == _brute(rows, tau), f"tau={tau}"


def test_matches_brute_force_random(spark):
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(40)]
    rows = []
    for i in range(60):
        base = rng.sample(vocab, rng.randint(3, 12))
        rows.append((f"d{i:02d}", base))
        if rng.random() < 0.4:  # plant a near-duplicate
            mut = list(base)
            if rng.random() < 0.5 and len(mut) > 3:
                mut.pop(rng.randrange(len(mut)))
            else:
                mut.append(rng.choice(vocab))
            rows.append((f"d{i:02d}x", mut))
    for tau in (0.6, 0.8):
        got = _run(spark, rows, tau)
        assert got == _brute(rows, tau), f"tau={tau}"
        assert len(got) > 0  # the planted near-dups must be found


def test_duplicate_tokens_are_distinctified(spark):
    rows = [("a", ["x", "x", "y"]), ("b", ["y", "x"])]
    # sets are {x,y} on both sides -> J = 1
    assert _run(spark, rows, 0.9) == {("a", "b", 1.0)}


def test_token_bucket_cap_trades_recall(spark):
    # every set shares the hot token h; distinctive tokens differ
    rows = [(f"i{k}", ["h", f"u{k}"]) for k in range(6)] + [("p", ["h", "u0"])]
    full = _run(spark, rows, 0.5)
    assert ("i0", "p", 1.0) in full
    capped = _run(spark, rows, 0.5, max_token_bucket=1)
    assert capped <= full  # never invents pairs, may drop some
    assert len(capped) < len(full)


def test_validations(spark):
    rows = [("a", ["x"])]
    with pytest.raises(ValueError, match="threshold"):
        _run(spark, rows, 0.0)
    with pytest.raises(ValueError, match="max_token_bucket"):
        _run(spark, rows, 0.5, max_token_bucket=0)
