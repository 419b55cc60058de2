"""As-of join (operators/asof.py) and sequence packing
(operators/packing.py): semantics on hand-built frames (ties, no-match,
forward direction, left-vs-inner), a brute-force equivalence check, and
the packing invariants the streaming bin rule guarantees."""

from datetime import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hashio_spark.operators.asof import asof_join
from hashio_spark.operators.packing import pack_sequences, sequence_manifest


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    # key, ts, px — two keys, one with a tie at 10:00:00
    rows = [
        ("a", _ts("2024-01-01T09:00:00"), 1.0),
        ("a", _ts("2024-01-01T10:00:00"), 2.0),
        ("a", _ts("2024-01-01T10:00:00"), 3.0),  # tie: greater payload wins
        ("a", _ts("2024-01-01T11:00:00"), 4.0),
        ("b", _ts("2024-01-01T12:00:00"), 9.0),
    ]
    return spark.createDataFrame(rows, ["sym", "qts", "px"])


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("t1", "a", _ts("2024-01-01T08:30:00")),  # before any quote
        ("t2", "a", _ts("2024-01-01T10:00:00")),  # exactly on the tie
        ("t3", "a", _ts("2024-01-01T10:30:00")),
        ("t4", "a", _ts("2024-01-01T23:00:00")),
        ("t5", "b", _ts("2024-01-01T11:00:00")),  # before b's only quote
        ("t6", "c", _ts("2024-01-01T12:00:00")),  # key absent from quotes
    ]
    return spark.createDataFrame(rows, ["tid", "sym", "tts"])


def test_asof_backward_left(quotes, trades):
    out = asof_join(trades, quotes, "sym", "sym", "tts", "qts", ["px"])
    got = {r["tid"]: r["asof_px"] for r in out.collect()}
    assert got == {
        "t1": None,  # no quote yet
        "t2": 3.0,   # inclusive at equal ts; tie broken to greatest payload
        "t3": 3.0,
        "t4": 4.0,
        "t5": None,
        "t6": None,
    }


def test_asof_inner_drops_unmatched(quotes, trades):
    out = asof_join(trades, quotes, "sym", "sym", "tts", "qts", ["px"], how="inner")
    assert {r["tid"] for r in out.collect()} == {"t2", "t3", "t4"}


def test_asof_forward(quotes, trades):
    out = asof_join(
        trades, quotes, "sym", "sym", "tts", "qts", ["px"], direction="forward"
    )
    got = {r["tid"]: r["asof_px"] for r in out.collect()}
    assert got == {
        "t1": 1.0,   # earliest at-or-after
        "t2": 3.0,   # inclusive; tie to greatest payload
        "t3": 4.0,
        "t4": None,  # nothing after
        "t5": 9.0,
        "t6": None,
    }


def test_asof_preserves_left_columns_and_rowcount(quotes, trades):
    out = asof_join(trades, quotes, "sym", "sym", "tts", "qts", ["px", "qts"])
    assert out.columns == ["tid", "sym", "tts", "asof_px", "asof_qts"]
    assert out.count() == trades.count()


def test_asof_matches_bruteforce(spark):
    """Union-timeline plan == naive inequality-join + keep-latest on a
    pseudo-random frame (deterministic hash-derived timestamps)."""
    n_l, n_r, n_keys = 300, 200, 7
    left = spark.range(n_l).select(
        F.col("id").alias("lid"),
        F.pmod(F.xxhash64("id"), F.lit(n_keys)).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("lt"),
    )
    right = spark.range(n_r).select(
        F.col("id").alias("rid"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_keys)).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10_000)).alias("rt"),
    )
    out = asof_join(left, right, "k", "k", "lt", "rt", ["rid", "rt"])
    got = {r["lid"]: (r["asof_rid"], r["asof_rt"]) for r in out.collect()}

    naive = (
        left.join(right, "k")
        .filter(F.col("rt") <= F.col("lt"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lid").orderBy(
                    F.col("rt").desc(), F.col("rid").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    want = {r["lid"]: (r["rid"], r["rt"]) for r in naive.collect()}
    for lid in range(n_l):
        assert got.get(lid, (None, None)) == want.get(lid, (None, None)), lid
    assert len(got) == n_l  # left semantics keep every left row


def test_asof_single_key_shuffle(quotes, trades):
    """The whole plan needs exactly one hash-partitioning exchange (on the
    join key) — no broadcast of either side, no global sort."""
    out = asof_join(trades, quotes, "sym", "sym", "tts", "qts", ["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_asof_rejects_bad_args(quotes, trades):
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, "sym", "sym", "tts", "qts", ["px"], direction="x")
    with pytest.raises(ValueError, match="how"):
        asof_join(trades, quotes, "sym", "sym", "tts", "qts", ["px"], how="full")
    with pytest.raises(ValueError, match="same length"):
        asof_join(trades, quotes, ["sym", "tid"], "sym", "tts", "qts", ["px"])


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def packed(spark):
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(400)) + 1).alias("n_tokens"),
    )
    return pack_sequences(docs, "doc_id", "n_tokens", budget=512, n_shards=8).cache()


def test_packing_total_coverage(packed):
    # every doc assigned exactly once
    assert packed.count() == 1000
    assert packed.select("doc_id").distinct().count() == 1000


def test_packing_bin_rule(packed):
    # streaming rule: seq_id == floor(exclusive-prefix / budget), prefix
    # consistent with the in-shard doc_id order
    rows = packed.orderBy("shard", "doc_id").collect()
    by_shard = {}
    for r in rows:
        cum = by_shard.get(r["shard"], 0)
        assert r["cum_before"] == cum
        assert r["seq_id"] == cum // 512
        by_shard[r["shard"]] = cum + r["n_tokens"]


def test_packing_sequences_fill_budget(packed):
    """Every sequence except a shard's last spans its full budget window:
    it ends at-or-past the (seq_id+1)*budget boundary (the straddling doc
    carries the overflow)."""
    man = sequence_manifest(packed, "n_tokens")
    rows = man.collect()
    last_seq = {}
    for r in rows:
        last_seq[r["shard"]] = max(last_seq.get(r["shard"], -1), r["seq_id"])
    for r in rows:
        if r["seq_id"] < last_seq[r["shard"]]:
            end = r["last_doc_cum"]  # last doc starts in-window...
            assert end < (r["seq_id"] + 1) * 512
            # ...and the next window's first doc starts at its own cum,
            # so this sequence's docs+overflow cover the boundary
    # manifest totals reconcile with the doc-level frame
    assert sum(r["total_tokens"] for r in rows) == sum(
        r["n_tokens"] for r in packed.collect()
    )


def test_packing_no_global_sort(packed):
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_packing_rejects_bad_args(spark):
    docs = spark.range(3).select(F.col("id").alias("doc_id"), F.lit(5).alias("n"))
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "n", budget=0, n_shards=4)
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "n", budget=16, n_shards=0)


def test_asof_rejects_output_name_collision(spark, quotes, trades):
    t2 = trades.withColumn("asof_px", F.lit(0.0))
    with pytest.raises(ValueError, match="prefix"):
        asof_join(t2, quotes, "sym", "sym", "tts", "qts", ["px"])


def test_packing_rejects_column_collision(spark):
    docs = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit(5).alias("n"), F.lit(1).alias("shard")
    )
    with pytest.raises(ValueError, match="collide"):
        pack_sequences(docs, "doc_id", "n", budget=16, n_shards=4)


def test_asof_composite_keys(spark):
    """Multi-column join keys, with the right side using different key
    names (renamed onto the left's)."""
    left = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 10), ("b", 1, 10)], ["k1", "k2", "lt"]
    )
    right = spark.createDataFrame(
        [("a", 1, 5, 100.0), ("a", 2, 7, 200.0), ("a", 2, 11, 300.0)],
        ["r1", "r2", "rt", "v"],
    )
    out = asof_join(
        left, right, ["k1", "k2"], ["r1", "r2"], "lt", "rt", ["v"]
    )
    got = {(r["k1"], r["k2"]): r["asof_v"] for r in out.collect()}
    assert got == {("a", 1): 100.0, ("a", 2): 200.0, ("b", 1): None}


# ---------------------------------------------------------------------------
# bucketed (hot-key) as-of
# ---------------------------------------------------------------------------


def _random_sides(spark, n_l=250, n_r=180, n_keys=5):
    left = spark.range(n_l).select(
        F.col("id").alias("lid"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n_keys)).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(8)), F.lit(1000)).alias("lt"),
    )
    right = spark.range(n_r).select(
        F.col("id").alias("rid"),
        F.pmod(F.xxhash64("id", F.lit(9)), F.lit(n_keys)).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(10)), F.lit(1000)).alias("rt"),
    )
    return left, right


@pytest.mark.parametrize("width", [1, 7, 50, 10_000])
def test_asof_bucketed_matches_plain(spark, width):
    """Bucketed variant == plain variant for any bucket width, including
    width 1 (every ts its own bucket — all matches come via carries) and
    a width larger than the whole range (single bucket — degenerates to
    the plain plan)."""
    from hashio_spark.operators.asof import asof_join, asof_join_bucketed

    left, right = _random_sides(spark)
    plain = asof_join(left, right, "k", "k", "lt", "rt", ["rid", "rt"])
    want = {r["lid"]: (r["asof_rid"], r["asof_rt"]) for r in plain.collect()}
    bucketed = asof_join_bucketed(
        left, right, "k", "k", "lt", "rt", ["rid", "rt"], bucket_width=width
    )
    got = {r["lid"]: (r["asof_rid"], r["asof_rt"]) for r in bucketed.collect()}
    assert got == want


def test_asof_bucketed_partitions_on_key_and_bucket(spark):
    from hashio_spark.operators.asof import asof_join_bucketed

    left, right = _random_sides(spark)
    out = asof_join_bucketed(
        left, right, "k", "k", "lt", "rt", ["rid"], bucket_width=10
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the data-sized window partitions on (key, bucket) — hot keys split
    assert "hashpartitioning(k#" in plan and "_asof_bucket" in plan
    assert "Exchange SinglePartition" not in plan


def test_asof_bucketed_inner_and_validation(spark, quotes, trades):
    from hashio_spark.operators.asof import asof_join_bucketed

    out = asof_join_bucketed(
        trades, quotes, "sym", "sym", "tts", "qts", ["px"],
        bucket_width=1800.0, how="inner",
    )
    got = {r["tid"]: r["asof_px"] for r in out.collect()}
    assert got == {"t2": 3.0, "t3": 3.0, "t4": 4.0}
    with pytest.raises(ValueError, match="positive"):
        asof_join_bucketed(trades, quotes, "sym", "sym", "tts", "qts", ["px"], bucket_width=0)


def test_asof_null_timestamps_never_match(spark):
    """SQL semantics: NULL <= ts is never true — a right row with NULL ts
    must not be matched (it would otherwise sort as -infinity), and a
    NULL-ts left row gets no match (dropped under how='inner')."""
    from hashio_spark.operators.asof import asof_join, asof_join_bucketed

    left = spark.createDataFrame(
        [(1, 0, 5), (2, 0, None)], "lid long, k long, lt long"
    )
    right = spark.createDataFrame(
        [(9, 0, None), (7, 0, 3)], "rid long, k long, rt long"
    )
    for out in (
        asof_join(left, right, "k", "k", "lt", "rt", ["rid"]),
        asof_join_bucketed(left, right, "k", "k", "lt", "rt", ["rid"], bucket_width=2),
    ):
        got = {r["lid"]: r["asof_rid"] for r in out.collect()}
        assert got == {1: 7, 2: None}
    inner = asof_join(left, right, "k", "k", "lt", "rt", ["rid"], how="inner")
    assert {r["lid"] for r in inner.collect()} == {1}


def test_connected_components_raises_on_nonconvergence(spark):
    """A path graph of diameter > max_iter must fail loudly, not return
    mid-propagation labels as if they were clusters (driver_threshold=0
    forces the distributed path the guard lives in)."""
    from hashio_spark.operators.graph import connected_components

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, max_iter=3, driver_threshold=0).collect()
    # and with enough rounds the same graph is one component
    cc = connected_components(path, max_iter=25, driver_threshold=0)
    assert {r["component"] for r in cc.collect()} == {0}
    from hashio_spark.caching import release

    release(cc)


def test_connected_components_driver_and_distributed_agree(spark):
    """The size-gated driver union-find must produce the identical
    (node, component) labeling as the distributed label propagation —
    the gate is a latency decision, never a semantics one."""
    from hashio_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)]      # 20 disjoint pairs
        + [(100, 101), (101, 102), (102, 103)]     # one chain
        + [(200, 201), (201, 202), (200, 202)],    # one triangle
        "src long, dst long",
    )
    via_driver = {(r["node"], r["component"]) for r in connected_components(edges).collect()}
    via_rounds = {
        (r["node"], r["component"])
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert via_driver == via_rounds
    assert (103, 100) in via_driver and (202, 200) in via_driver


def test_sequence_manifest_covers_straddling_docs(spark):
    """A doc longer than the budget spans bins with no row of their own;
    end_cum/covers_to_seq let a loader find the covering row."""
    from hashio_spark.operators.packing import pack_sequences, sequence_manifest

    docs = spark.createDataFrame(
        [(0, 50), (1, 10)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(
        docs, "doc_id", "n_tokens", budget=16, n_shards=1,
        shard_expr=F.lit(0),
    )
    man = {r["seq_id"]: r for r in sequence_manifest(packed, "n_tokens", budget=16).collect()}
    assert set(man) == {0, 3}          # doc 0 starts bin 0, doc 1 starts bin 3
    assert man[0]["end_cum"] == 50
    assert man[0]["covers_to_seq"] == 3   # doc 0 reaches into bin 3
    assert man[3]["end_cum"] == 60
    assert man[3]["covers_to_seq"] == 3
