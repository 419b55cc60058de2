"""mixture_weights / compaction_plan / z-order layout tests."""

import math

import pytest
from pyspark.sql import functions as F


def _mix_df(spark):
    rows = [("en", 800), ("de", 120), ("fr", 60), ("zh", 20)]
    data = []
    for lang, n in rows:
        for i in range(n):
            data.append((f"{lang}-{i}", lang, 100))
    return spark.createDataFrame(data, "doc_id string, lang string, n_chars int")


class TestMixtureWeights:
    def test_uniform_targets(self, spark):
        from hashio_spark.operators.mixing import mixture_weights

        out = {
            r["stratum"]: r
            for r in mixture_weights(_mix_df(spark), "lang", "n_chars", cap=100.0).collect()
        }
        assert set(out) == {"en", "de", "fr", "zh"}
        # uniform target = 0.25 each; nothing capped at cap=100
        for r in out.values():
            assert r["target_share"] == 0.25
            assert not r["capped"]
            # weight * actual == target when uncapped
            assert math.isclose(r["weight"] * r["actual_share"], 0.25, rel_tol=1e-4)
        # uncapped weights → effective shares hit the targets
        assert math.isclose(sum(r["effective_share"] for r in out.values()), 1.0, abs_tol=1e-5)
        assert math.isclose(out["zh"]["effective_share"], 0.25, abs_tol=1e-5)

    def test_cap_binds_and_renormalizes(self, spark):
        from hashio_spark.operators.mixing import mixture_weights

        out = {
            r["stratum"]: r
            for r in mixture_weights(_mix_df(spark), "lang", "n_chars", cap=2.0).collect()
        }
        # zh actual share = 0.02, target 0.25 → needs 12.5× but capped at 2×
        assert out["zh"]["capped"] and out["zh"]["weight"] == 2.0
        assert not out["en"]["capped"]
        # effective shares still sum to 1 after the cap
        assert math.isclose(sum(r["effective_share"] for r in out.values()), 1.0, abs_tol=1e-5)
        # capped stratum lands BELOW its target
        assert out["zh"]["effective_share"] < 0.25

    def test_explicit_targets_split_rest(self, spark):
        from hashio_spark.operators.mixing import mixture_weights

        out = {
            r["stratum"]: r
            for r in mixture_weights(
                _mix_df(spark), "lang", "n_chars", targets={"en": 0.4}, cap=50.0
            ).collect()
        }
        assert out["en"]["target_share"] == 0.4
        # remaining 0.6 split over the 3 unlisted strata
        for s in ("de", "fr", "zh"):
            assert out[s]["target_share"] == 0.2

    def test_target_naming_absent_stratum_contributes_no_mass(self, spark):
        """r4 ADVICE: a target naming a stratum absent from the corpus must
        not consume target mass — previously the unlisted strata split
        (1 - Σ ALL listed) so shares silently summed to <1."""
        from hashio_spark.operators.mixing import mixture_weights

        out = {
            r["stratum"]: r
            for r in mixture_weights(
                _mix_df(spark), "lang", "n_chars",
                targets={"en": 0.4, "ja": 0.3},  # ja absent from the corpus
                cap=50.0,
            ).collect()
        }
        assert set(out) == {"en", "de", "fr", "zh"}
        assert out["en"]["target_share"] == 0.4
        # absent 'ja' contributes nothing: remaining 0.6 over 3 unlisted
        for s in ("de", "fr", "zh"):
            assert out[s]["target_share"] == 0.2
        assert math.isclose(sum(r["target_share"] for r in out.values()), 1.0, abs_tol=1e-6)

    def test_feeds_sample_stratified(self, spark):
        """Weights compose with the hash-gate sampler: rate = weight × base."""
        from hashio_spark.operators.mixing import mixture_weights
        from hashio_spark.operators.sampling import sample_stratified

        df = _mix_df(spark)
        w = {
            r["stratum"]: r["weight"]
            for r in mixture_weights(df, "lang", "n_chars", cap=3.0).collect()
        }
        base = 0.3
        rates = {s: min(1.0, base * wt) for s, wt in w.items()}
        got = (
            sample_stratified(df, "doc_id", "lang", rates)
            .groupBy("lang")
            .count()
            .collect()
        )
        counts = {r["lang"]: r["count"] for r in got}
        # upweighted rare strata keep a larger fraction than 'en'
        assert counts["de"] / 120 > counts["en"] / 800


class TestCompactionPlan:
    def test_next_fit_grouping(self, spark):
        from hashio_spark.operators.layout import compaction_plan

        parts = spark.createDataFrame(
            [("p00", 40), ("p01", 40), ("p02", 40), ("p03", 100), ("p04", 10),
             ("p05", 10), ("p06", 10), ("p07", 200)],
            "partition_id string, bytes long",
        )
        out = {r["partition_id"]: r for r in
               compaction_plan(parts, "partition_id", "bytes", target_size=100).collect()}
        # groups assigned by floor(cum_before / target) in key order:
        # cum_before: 0,40,80,120,220,230,240,250 → groups 0,0,0,1,2,2,2,2
        assert [out[f"p0{i}"]["file_group"] for i in range(8)] == [0, 0, 0, 1, 2, 2, 2, 2]
        # key order is preserved inside a group (range-metadata locality)
        assert out["p03"]["group_bytes"] == 100
        assert out["p07"]["group_bytes"] == 230

    def test_groups_cover_all_and_respect_order(self, spark):
        from hashio_spark.operators.layout import compaction_plan

        parts = spark.range(50).select(
            F.format_string("p%02d", F.col("id")).alias("partition_id"),
            (F.col("id") % 7 * 10 + 5).alias("bytes"),
        )
        rows = compaction_plan(parts, "partition_id", "bytes", target_size=80).collect()
        assert len(rows) == 50
        groups = [r["file_group"] for r in sorted(rows, key=lambda r: r["partition_id"])]
        # non-decreasing group ids in key order (next-fit invariant)
        assert all(a <= b for a, b in zip(groups, groups[1:]))


class TestZOrder:
    def test_zvalue_interleave(self, spark):
        from hashio_spark.operators.layout import zvalue_expr

        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (255, 255), (0b1010, 0b0101)],
            "a int, b int",
        )
        out = [r["z"] for r in df.select(zvalue_expr(F.col("a"), F.col("b")).alias("z")).collect()]
        assert out[0] == 0
        assert out[1] == 1          # a contributes even bit positions
        assert out[2] == 2          # b contributes odd bit positions
        assert out[3] == 65535      # all 16 bits set
        # 1010 interleaved with 0101 → alternating pattern 0b0110011001100110? no:
        # bit i of a → position 2i; bit i of b → position 2i+1
        a, b = 0b1010, 0b0101
        expect = sum(((a >> i) & 1) << (2 * i) for i in range(8)) + sum(
            ((b >> i) & 1) << (2 * i + 1) for i in range(8)
        )
        assert out[4] == expect

    def test_cluster_by_zorder_ranges_disjoint(self, spark):
        from hashio_spark.operators.layout import cluster_by_zorder, zvalue_expr

        df = spark.range(4000).select(
            F.col("id"),
            (F.col("id") % 251).cast("int").alias("x"),
            (F.pmod(F.col("id") * 37, F.lit(241))).cast("int").alias("y"),
        ).withColumn("z", zvalue_expr(F.col("x"), F.col("y")))
        out = cluster_by_zorder(df, "z", n_partitions=4)
        ranges = (
            out.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
            .orderBy("lo")
            .collect()
        )
        assert len(ranges) >= 2
        for prev, nxt in zip(ranges, ranges[1:]):
            # range-partitioned on z: file/partition z-ranges don't overlap,
            # which is what gives min/max pruning on BOTH source dims
            assert prev["hi"] <= nxt["lo"]
