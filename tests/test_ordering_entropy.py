"""Tests for the training-order / curation / entropy / rolling operators
(operators/ordering.py, terms.token_entropy, stats.rolling_stats,
dedupe.duplicate_lines)."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- ordering


@pytest.fixture(scope="module")
def small_docs(spark):
    rows = [(i, f"doc {i} text", "s" + str(i % 3)) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_shuffle_shards_deterministic_and_total(spark, small_docs):
    from hashio_spark.operators.ordering import shuffle_shards

    a = shuffle_shards(small_docs, "doc_id", n_shards=8).collect()
    b = shuffle_shards(small_docs.repartition(3), "doc_id", n_shards=8).collect()
    # layout-independent: same (doc_id -> shard, pos) under any partitioning
    assert {(r.doc_id, r.shard, r.pos) for r in a} == {(r.doc_id, r.shard, r.pos) for r in b}
    # total: every row present exactly once, pos is 1..n within each shard
    assert len(a) == 200
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    assert set(by_shard) <= set(range(8))


def test_shuffle_shards_md5_matches_python_model(spark, small_docs):
    import hashlib

    from hashio_spark.operators.ordering import shuffle_shards

    got = {
        r.doc_id: (r.shard, r.pos)
        for r in shuffle_shards(small_docs, "doc_id", n_shards=4, method="md5").collect()
    }

    def h(doc_id):
        return int(hashlib.md5(f"{doc_id}s42".encode()).hexdigest()[:15], 16)

    def shard(doc_id):
        return (h(doc_id) % 1_000_000) % 4

    # shard from the mod-1e6 residue; pos from the FULL 60-bit hash
    order = sorted(range(200), key=lambda i: (shard(i), h(i), i))
    pos, last = {}, {}
    for i in order:
        s = shard(i)
        pos[i] = last.get(s, 0) + 1
        last[s] = pos[i]
    want = {i: (shard(i), pos[i]) for i in range(200)}
    assert got == want


def test_shuffle_shards_pos_breaks_residue_collisions_by_full_hash(spark):
    """r4 ADVICE: pos must order by the FULL hash — at 10^12 rows the
    mod-1e6 residue collides ~10^6 times per value, collapsing within-
    shard order to the key tiebreak (key-sequential runs in the training
    order).  Plant a real residue collision and check the colliding pair
    orders by full hash, not by key."""
    import hashlib

    from hashio_spark.operators.ordering import shuffle_shards

    def h(i):
        return int(hashlib.md5(f"{i}s42".encode()).hexdigest()[:15], 16)

    seen: dict[int, int] = {}
    pair = None
    for i in range(200_000):
        r = h(i) % 1_000_000
        if r in seen:
            pair = (seen[r], i)
            break
        seen[r] = i
    assert pair is not None, "no residue collision in probe range"
    lo_key, hi_key = pair  # lo_key < hi_key by construction
    df = spark.createDataFrame([(lo_key,), (hi_key,)], "doc_id long")
    out = {r.doc_id: r.pos for r in shuffle_shards(df, "doc_id", n_shards=1, method="md5").collect()}
    want_first = lo_key if h(lo_key) < h(hi_key) else hi_key
    # under residue-ordering both tie and fall back to doc_id (lo first);
    # make the probe meaningful: keep scanning if hash order == key order
    if want_first == lo_key:
        # find another colliding pair where full-hash order INVERTS key order
        seen2: dict[int, int] = {}
        pair = None
        for i in range(500_000):
            r = h(i) % 1_000_000
            if r in seen2 and h(seen2[r]) > h(i):
                pair = (seen2[r], i)
                break
            seen2.setdefault(r, i)
        assert pair is not None
        lo_key, hi_key = pair  # lo_key earlier key, but LARGER hash
        df = spark.createDataFrame([(lo_key,), (hi_key,)], "doc_id long")
        out = {r.doc_id: r.pos for r in shuffle_shards(df, "doc_id", n_shards=1, method="md5").collect()}
        want_first = hi_key
    assert out[want_first] == 1, "pos ordered by residue/key, not full hash"


def test_shuffle_shards_rejects_bad_n():
    from hashio_spark.operators.ordering import shuffle_shards

    with pytest.raises(ValueError):
        shuffle_shards(None, "doc_id", n_shards=0)


# ------------------------------------------------------------ quantile gate


def test_quantile_gate_exact_keeps_top_fraction(spark):
    from hashio_spark.operators.ordering import quantile_gate

    rows = [(i, float(i % 10), "g") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, score double, grp string")
    out = quantile_gate(df, "score", "grp", keep_frac=0.3, tiebreak_col="id").collect()
    kept = sorted(r.id for r in out if r.kept)
    # percent_rank >= 0.7 over (score, id): scores 0..9 each x10; the kept
    # set is the top 30 rows of the (score, id) order — scores 7, 8, 9.
    assert len(kept) == 30
    assert all(r.score >= 7.0 for r in out if r.kept)
    assert all(r.score < 7.0 or not r.kept is None for r in out)


def test_quantile_gate_keeps_singleton_groups(spark):
    """r4 ADVICE: percent_rank of a 1-row group is 0.0, which never clears
    1-keep_frac for keep_frac<1 — 'keep top 50% of each source' must not
    silently discard every single-row source."""
    from hashio_spark.operators.ordering import quantile_gate

    rows = [(i, float(i), "big") for i in range(10)] + [(100, 0.0, "solo")]
    df = spark.createDataFrame(rows, "id long, score double, grp string")
    out = {r.id: r.kept for r in quantile_gate(df, "score", "grp", 0.5, "id").collect()}
    assert out[100] is True, "singleton group dropped by the gate"
    assert sum(out[i] for i in range(10)) == 5  # big group unchanged


def test_quantile_gate_approx_close_to_exact(spark):
    from hashio_spark.operators.ordering import quantile_gate, quantile_gate_approx

    rows = [(i, float(i), "g") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, score double, grp string")
    exact = {r.id for r in quantile_gate(df, "score", "grp", 0.25, "id").collect() if r.kept}
    approx = {r.id for r in quantile_gate_approx(df, "score", "grp", 0.25).collect() if r.kept}
    # high sketch accuracy on distinct values: identical or off-by-boundary
    assert len(exact.symmetric_difference(approx)) <= 2
    with pytest.raises(ValueError):
        quantile_gate(df, "score", "grp", 0.0)
    with pytest.raises(ValueError):
        quantile_gate_approx(df, "score", "grp", 1.5)


# --------------------------------------------------------------- entropy


def test_token_entropy_matches_python_model(spark):
    from hashio_spark.operators.terms import token_entropy

    rows = [
        (1, "a a a a", "uniform1"),     # one token: H = 0
        (2, "a b c d", "uniform4"),     # four equiprobable: H = ln 4
        (3, "a a a b", "skewed"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in token_entropy(df, "source", "text").collect()}
    assert got["uniform1"].entropy == 0.0
    assert got["uniform1"].entropy_norm == 0.0  # vocab_size == 1 guard
    assert got["uniform4"].entropy == round(math.log(4), 6)
    assert got["uniform4"].entropy_norm == 1.0
    h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert got["skewed"].entropy == round(h, 6)
    assert got["skewed"].n_tokens == 4 and got["skewed"].vocab_size == 2


# ---------------------------------------------------------- rolling stats


def test_rolling_stats_matches_python_model(spark):
    from hashio_spark.operators.stats import rolling_stats

    rows = [(i, i % 2, float(i), i) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double, ts long")
    out = rolling_stats(df, "user_id", ["ts", "event_id"], "value", window_rows=3).collect()
    for r in out:
        vals = [float(v) for v in range(10) if v % 2 == r.user_id and v <= r.event_id]
        assert r.seq == len(vals)
        assert r.running_sum == round(sum(vals), 6)
        assert r.moving_avg == round(sum(vals[-3:]) / len(vals[-3:]), 6)


def test_rolling_stats_single_window_node(spark):
    """Both frames share one (partition, order) spec — the physical plan
    must contain exactly ONE exchange on user_id and one sort."""
    from hashio_spark.operators.stats import rolling_stats

    rows = [(i, i % 2, float(i), i) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double, ts long")
    plan = rolling_stats(df, "user_id", ["ts", "event_id"], "value")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("+- Sort ") <= 1 or plan.count("Sort [") <= 2


# ---------------------------------------------------------- line dedup


def test_duplicate_lines_finds_planted_boilerplate(spark):
    from hashio_spark.operators.dedupe import duplicate_lines

    banner = "This site uses cookies to improve your experience"
    rows = [
        (1, f"Unique intro one. {banner}. Unique tail one."),
        (2, f"Another opener here. {banner}. Something else entirely."),
        (3, f"{banner}. {banner}. Totally different content here."),
        (4, "No shared sentences in this one. Short bits only."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_lines(df, "doc_id", "text", min_chars=20, min_docs=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r.line == banner.lower()
    assert r.n_docs == 3          # distinct docs
    assert r.n_occurrences == 4   # doc 3 has it twice


def test_duplicate_lines_hashed_tier_agrees(spark):
    from hashio_spark.operators.dedupe import duplicate_lines

    banner = "this exact sentence appears in two documents"
    rows = [(1, f"{banner}. other stuff here."), (2, f"prefix text. {banner}. end bit.")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    raw = duplicate_lines(df, min_chars=20, hashed=False).collect()
    hashed = duplicate_lines(df, min_chars=20, hashed=True).collect()
    assert len(raw) == len(hashed) == 1
    assert raw[0].n_docs == hashed[0].n_docs == 2
    assert isinstance(hashed[0].line, int)  # xxhash64 key, 8-byte shuffle
