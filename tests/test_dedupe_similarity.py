"""Dedupe + similarity operators: planted near-dup fixtures with exact
expected answers, and a brute-force oracle for LSH recall."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hashio_spark.operators import dedupe as D
from hashio_spark.operators import similarity as S


@pytest.fixture(scope="module")
def text_docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    rows = [
        ("d1", base),
        ("d2", base),  # exact dup of d1
        ("d3", base + " extra"),  # near dup of d1
        ("d4", "completely different words describing spark shuffle partitions"),
        ("d5", "another unrelated text about columnar parquet scan pruning"),
        ("d6", base.replace("quick", "rapid")),  # near dup, one token changed
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_duplicates(text_docs):
    out = D.exact_duplicates(text_docs, "doc_id", "text").collect()
    assert len(out) == 1
    assert out[0]["dup_count"] == 2 and out[0]["keys"] == ["d1", "d2"]


def test_minhash_lsh_finds_near_dups(text_docs):
    sig = D.minhash_signatures(text_docs, "doc_id", "text", n_perm=16)
    pairs = {(r["key_a"], r["key_b"]) for r in D.lsh_candidate_pairs(sig, n_bands=4).collect()}
    assert ("d1", "d2") in pairs  # exact dups always collide on every band
    # near-dups should be caught by at least one band; unrelated not
    assert ("d1", "d4") not in pairs and ("d4", "d5") not in pairs


def test_ngram_jaccard_verification(text_docs):
    sig = D.minhash_signatures(text_docs, "doc_id", "text", n_perm=16)
    cand = D.lsh_candidate_pairs(sig, n_bands=4)
    verified = {(r["key_a"], r["key_b"]): r["jaccard"] for r in
                D.ngram_jaccard_pairs(text_docs, cand, "doc_id", "text", threshold=0.5).collect()}
    assert verified.get(("d1", "d2")) == 1.0
    for (a, b) in verified:
        assert {a, b} <= {"d1", "d2", "d3", "d6"}


def _simhash64_py(text: str) -> int:
    """Driver-side golden replica of operators.dedupe.simhash64: Spark
    xxhash64 per \\s+-token (split('') -> ['']), ±1 majority vote per bit,
    signed 64-bit assembly."""
    import re

    from hashio_spark.functions.xxh import spark_xxhash64_str

    toks = re.split(r"\s+", text)  # NB: '' -> [''] — matches Spark split()
    counts = [0] * 64
    for t in toks:
        h = spark_xxhash64_str(t)
        for b in range(64):
            counts[b] += 1 if (h & (1 << b)) != 0 else -1
    sim = 0
    for b in range(64):
        if counts[b] > 0:
            sim |= 1 << b
    return sim - (1 << 64) if sim >= (1 << 63) else sim


def test_simhash64_golden(text_docs, short_docs):
    """The production xxhash64 SimHash, value-checked against a pure-Python
    recomputation (the REGISTRY-level oracle cannot cover xxhash64 — this
    is its golden-value stand-in, per r02 VERDICT next-step #4)."""
    for fixture in (text_docs, short_docs):
        rows = {r["doc_id"]: r["text"] for r in fixture.select("doc_id", "text").collect()}
        got = {r["key"]: r["simhash"] for r in D.simhash64(fixture, "doc_id", "text").collect()}
        expected = {k: _simhash64_py(v) for k, v in rows.items()}
        assert got == expected


def test_simhash64_null_text_yields_null(spark):
    """NULL text → NULL simhash (split(NULL) is NULL and the Arrow vote
    kernel must propagate it, matching the old fold's null semantics)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b c"), (2, None)], "doc_id long, text string")
    got = {r["key"]: r["simhash"] for r in D.simhash64(df, "doc_id", "text").collect()}
    assert got[2] is None and got[1] is not None


def test_simhash_near_dup_hamming(text_docs):
    sim = D.simhash64(text_docs, "doc_id", "text")
    vals = {r["key"]: r["simhash"] for r in sim.collect()}
    assert vals["d1"] == vals["d2"]
    ham_13 = bin(vals["d1"] ^ vals["d3"]).count("1")
    ham_14 = bin(vals["d1"] ^ vals["d4"]).count("1")
    assert ham_13 < ham_14
    cands = {(r["key_a"], r["key_b"]): r["hamming"] for r in D.simhash_candidates(sim).collect()}
    assert cands.get(("d1", "d2")) == 0


@pytest.fixture(scope="module")
def embeddings(spark):
    import numpy as np

    rng = np.random.RandomState(42)
    vecs = rng.randn(40, 16)
    vecs[1] = vecs[0] + 0.01 * rng.randn(16)  # planted near-dup of vec 0
    pdf = pd.DataFrame({"vec_id": range(40), "embedding": [v.astype("float32").tolist() for v in vecs]})
    return spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")


def test_brute_force_topk_matches_numpy(embeddings):
    import numpy as np

    q = embeddings.filter(F.col("vec_id") == 0)
    out = S.brute_force_topk(embeddings, q, "vec_id", "embedding", k=3).collect()
    got = [(r["rank"], r["neighbor_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    pdf = embeddings.toPandas().sort_values("vec_id")
    M = np.array([np.array(v, dtype="float64") for v in pdf["embedding"]])
    sims = M @ M[0] / (np.linalg.norm(M, axis=1) * np.linalg.norm(M[0]))
    order = [i for i in np.argsort(-sims) if i != 0][:3]
    assert [n for _, n in got] == order
    assert got[0][1] == 1  # the planted near-dup is the top neighbor


def test_embedding_neardup_pairs(embeddings):
    out = D.embedding_neardup_pairs(embeddings, "vec_id", "embedding", threshold=0.95).collect()
    assert {(r["key_a"], r["key_b"]) for r in out} == {(0, 1)}


def test_neardup_pairs_null_vector_skipped(spark, embeddings):
    """A NULL embedding row must yield NULL band values (posexplode emits
    no rows for it) instead of crashing the Arrow sign kernel — the
    null-propagation the old expression-fold form had."""
    from pyspark.sql import functions as F

    with_null = embeddings.unionByName(
        spark.createDataFrame(
            [(999,)], "vec_id long"
        ).select("vec_id", F.lit(None).cast("array<float>").alias("embedding"))
    )
    out = S.neardup_pairs(with_null, "vec_id", "embedding", threshold=0.95, dim=16).collect()
    assert {(r["key_a"], r["key_b"]) for r in out} == {(0, 1)}
    assert all(999 not in (r["key_a"], r["key_b"]) for r in out)


def test_neardup_pairs_adaptive(embeddings):
    """Adaptive-planes full-corpus near-dup: planted pair (0,1) with
    cosine≈1 lands in the same bucket (deterministic planes) and survives
    the exact re-rank; plane count self-scales from the corpus count."""
    out = S.neardup_pairs(embeddings, "vec_id", "embedding", threshold=0.95, dim=16).collect()
    assert {(r["key_a"], r["key_b"]) for r in out} == {(0, 1)}


def test_ivf_topk_finds_planted_neighbor(embeddings):
    """IVF with a deterministic codebook: query 0's planted near-dup
    (cos≈1) shares its centroid, so any n_probe>=1 finds it; probing all
    lists reproduces the exact brute-force ranks."""
    q = embeddings.filter(F.col("vec_id") == 0)
    out = S.ivf_topk(embeddings, q, "vec_id", "embedding", k=3, n_list=8, n_probe=2).collect()
    assert any(r["neighbor_id"] == 1 and r["rank"] == 1 for r in out)
    # n_probe = n_list -> exact: ranks match brute force
    exact = S.brute_force_topk(embeddings, q, "vec_id", "embedding", k=3).collect()
    full = S.ivf_topk(embeddings, q, "vec_id", "embedding", k=3, n_list=8, n_probe=8).collect()
    assert sorted((r["rank"], r["neighbor_id"]) for r in full) == sorted(
        (r["rank"], r["neighbor_id"]) for r in exact
    )


def test_lsh_topk_recall(embeddings):
    """LSH with few planes must include the planted near-dup for query 0
    (same-bucket probability ~1 for cosine≈1)."""
    q = embeddings.filter(F.col("vec_id") == 0)
    out = S.lsh_topk(embeddings, q, "vec_id", "embedding", k=3, n_planes=6, dim=16).collect()
    assert any(r["neighbor_id"] == 1 for r in out)


def test_multimodal_plumbing(spark):
    from hashio_spark.operators.multimodal import extract_media_features, synth_media_table

    media = synth_media_table(spark, 50)
    out = extract_media_features(media)
    rows = out.collect()
    assert len(rows) == 50
    # deterministic digests + kind-appropriate metadata shape
    byid = {r["media_ref"]: r for r in rows}
    assert all(r["n_bytes"] > 0 and len(r["content_digest"]) == 32 for r in rows)
    for r in rows:
        if r["media_kind"] == "image":
            assert r["width"] is not None and r["duration_ms"] is None
        else:
            assert r["duration_ms"] is not None
    # rerun → identical (determinism)
    rows2 = extract_media_features(media).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_repartition_for_media_routing_is_layout_independent(spark):
    """The media salt must be CONTENT-derived (r4 VERDICT wrong #2): with
    ``F.rand`` (position-dependent) a recomputed map task re-routes rows —
    the SPARK-23207 duplicate/lost-row hazard.  Routing must therefore be
    a pure function of the row: identical across re-evaluation AND across
    a different input partition layout (a stage retry is exactly 'the same
    rows arriving in a different layout')."""
    from hashio_spark.operators.multimodal import repartition_for_media, synth_media_table

    media = synth_media_table(spark, 200)

    def routing(df):
        out = repartition_for_media(df, 8).select(
            "doc_id", F.spark_partition_id().alias("pid")
        )
        return {r["doc_id"]: r["pid"] for r in out.collect()}

    base = routing(media)
    assert routing(media) == base  # re-evaluation
    assert routing(media.repartition(13)) == base  # different input layout
    # and it actually spreads: a hot asset's rows land on >1 partition
    hot = synth_media_table(spark, 200).withColumn("media_ref", F.lit("asset-hot"))
    pids = {r["pid"] for r in repartition_for_media(hot, 8)
            .select(F.spark_partition_id().alias("pid")).collect()}
    assert len(pids) > 1


def test_no_rand_in_shuffle_key_positions():
    """Source-level guard (r4 VERDICT wrong #2 'done' criterion): no
    ``repartition``/``repartitionByRange`` call anywhere in the package
    passes a ``rand``-derived key."""
    import ast
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "hashio_spark"

    def has_rand(node: ast.AST) -> bool:
        for sub in ast.walk(node):
            if isinstance(sub, ast.Call):
                f = sub.func
                name = f.attr if isinstance(f, ast.Attribute) else getattr(f, "id", "")
                if name in ("rand", "randn"):
                    return True
        return False

    offenders = []
    for path in pkg.rglob("*.py"):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in ("repartition", "repartitionByRange", "partitionBy")
                and any(has_rand(a) for a in node.args)
            ):
                offenders.append(f"{path.name}:{node.lineno}")
    assert not offenders, f"rand-derived shuffle keys: {offenders}"


@pytest.fixture(scope="module")
def short_docs(spark):
    """Docs below the shingle width k=3 — the unguarded sequence(1, size-2)
    is DESCENDING for these and crashed every shingle consumer (round-1
    VERDICT #3)."""
    rows = [
        ("s0", ""),
        ("s1", "one"),
        ("s2", "two words"),
        ("s3", "three words here"),
        ("s4", "the quick brown fox jumps over the lazy dog"),
        ("s5", "the quick brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_shingles_empty_for_short_docs(short_docs):
    from hashio_spark.functions.text import word_shingles_expr

    out = {r["doc_id"]: r["sh"] for r in
           short_docs.select("doc_id", word_shingles_expr("text", 3).alias("sh")).collect()}
    assert out["s0"] == [] and out["s1"] == [] and out["s2"] == []
    assert out["s3"] == ["three words here"]
    assert len(out["s4"]) == 7


def test_minhash_lsh_survives_short_docs(short_docs):
    sig = D.minhash_signatures(short_docs, "doc_id", "text", n_perm=16)
    vals = {r["key"]: r["sig"] for r in sig.collect()}
    # shingle-less docs carry null signatures
    assert vals["s1"][0] is None and vals["s2"][0] is None
    assert vals["s3"][0] is not None
    pairs = {(r["key_a"], r["key_b"]) for r in D.lsh_candidate_pairs(sig, n_bands=4).collect()}
    assert ("s4", "s5") in pairs
    # null-signature docs must never co-band with each other
    assert ("s0", "s1") not in pairs and ("s1", "s2") not in pairs


def test_jaccard_fingerprint_simhash_survive_short_docs(short_docs):
    from hashio_spark.functions.text import rolling_fingerprint_expr

    cand = spark_pairs = short_docs.sparkSession.createDataFrame(
        pd.DataFrame([("s1", "s2"), ("s4", "s5")], columns=["key_a", "key_b"]))
    j = {(r["key_a"], r["key_b"]): r["jaccard"] for r in
         D.ngram_jaccard_pairs(short_docs, cand, "doc_id", "text", threshold=0.0).collect()}
    assert j[("s4", "s5")] == 1.0
    assert j[("s1", "s2")] == 0.0  # empty shingle sets -> jaccard 0, no crash
    fp = short_docs.select("doc_id", rolling_fingerprint_expr("text").alias("fp")).collect()
    assert len(fp) == 6  # no crash on <k-token docs
    sim = D.simhash64(short_docs, "doc_id", "text").collect()
    assert len(sim) == 6


def test_multimodal_frame_sample_and_resize(spark):
    from hashio_spark.operators.multimodal import (
        resize_images,
        sample_frames,
        synth_media_table,
    )

    media = synth_media_table(spark, 60)
    kinds = {r["media_kind"] for r in media.select("media_kind").distinct().collect()}
    assert "video" in kinds and "image" in kinds

    frames = sample_frames(media, n_frames=4).collect()
    n_videos = media.filter(F.col("media_kind") == "video").count()
    assert len(frames) == 4 * n_videos
    by_ref = {}
    for r in frames:
        by_ref.setdefault(r["media_ref"], []).append(r)
    for ref, rs in by_ref.items():
        idxs = sorted(x["frame_idx"] for x in rs)
        assert idxs == [0, 1, 2, 3]
        # evenly spaced, monotonic timestamps; distinct frame digests
        ts = [x["frame_ts_ms"] for x in sorted(rs, key=lambda x: x["frame_idx"])]
        assert ts == sorted(ts) and ts[0] == 0
        assert len({x["frame_digest"] for x in rs}) == 4

    resized = resize_images(media, max_side=100).collect()
    n_images = media.filter(F.col("media_kind") == "image").count()
    assert len(resized) == n_images
    for r in resized:
        assert max(r["resized_width"], r["resized_height"]) <= 100
        # aspect ratio preserved within integer rounding
        assert abs(r["resized_width"] / r["resized_height"] - r["width"] / r["height"]) < 0.05
    # determinism
    again = resize_images(media, max_side=100).collect()
    assert sorted(map(tuple, resized)) == sorted(map(tuple, again))


def test_lsh_persisted_intermediate_released(spark):
    """Operators persist an internal banding; the handle rides the result
    and caching.release drops it (round-3 ADVICE: repeated calls from a
    long-lived driver accumulated cached RDDs until LRU eviction)."""
    import pandas as pd

    from hashio_spark.caching import release
    from hashio_spark.operators.dedupe import lsh_candidate_pairs, minhash_signatures

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(40)],
        "text": ["the quick brown fox jumps over the lazy dog"] * 20
                + [f"unique text number {i} with words {i*7}" for i in range(20)],
    }))
    sig = minhash_signatures(df, "doc_id", "text", n_perm=4)
    pairs = lsh_candidate_pairs(sig, n_bands=2, n_perm=4)
    pairs.count()
    handles = getattr(pairs, "_hashio_persisted", ())
    assert handles and all(h.storageLevel.useMemory for h in handles)
    release(pairs)
    assert all(not h.storageLevel.useMemory for h in handles)
    assert getattr(pairs, "_hashio_persisted", ()) == ()


def test_ivf_centroids_hash_sample_covers_clusters(spark):
    """Centroid pick must be a distribution-representative sample: keys
    arrive in cluster order (0..29 cluster A, 30..59 cluster B, 60..89
    cluster C), so the old smallest-key pick put ALL centroids in
    cluster A and a small n_probe could miss other clusters entirely.
    The xxhash64-ordered sample must cover every cluster, and a cluster-C
    query at n_probe=1 must find its planted C neighbor."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    centers = {0: rng.normal(0, 1, 16), 1: rng.normal(8, 1, 16), 2: rng.normal(-8, 1, 16)}
    rows = []
    for i in range(90):
        c = i // 30
        rows.append((i, c, (centers[c] + rng.normal(0, 0.05, 16)).astype("float32").tolist()))
    pdf = pd.DataFrame(rows, columns=["vec_id", "cluster", "embedding"])
    emb = spark.createDataFrame(pdf[["vec_id", "embedding"]],
                                schema="vec_id long, embedding array<float>")

    cents = S.ivf_centroids(emb, "vec_id", "embedding", n_list=9)
    # classify each centroid by nearest cluster center
    covered = set()
    for cvec in cents:
        d = {k: float(np.linalg.norm(np.array(cvec) - centers[k])) for k in centers}
        covered.add(min(d, key=d.get))
    assert covered == {0, 1, 2}, f"hash sample missed clusters: {covered}"

    # a cluster-C query must find its nearest C neighbor probing ONE list
    q = emb.filter(F.col("vec_id") == 61)
    out = S.ivf_topk(emb, q, "vec_id", "embedding", k=3, n_list=9, n_probe=1,
                     centroids=cents).collect()
    assert out and all(60 <= r["neighbor_id"] < 90 for r in out)


def test_ingest_gate_drops_seen_and_batch_dupes(spark):
    from hashio_spark.operators.dedupe import ingest_gate

    seen = spark.createDataFrame([("d1",)], "digest string")
    incoming = spark.createDataFrame(
        [(10, "d1"), (11, "d2"), (12, "d2"), (13, "d3")],
        "doc_id long, digest string",
    )
    got = sorted(
        (r.doc_id, r.digest)
        for r in ingest_gate(incoming, seen, key_col="doc_id").collect()
    )
    # d1 already ingested; d2 keeps its min-key row only; d3 is new
    assert got == [(11, "d2"), (13, "d3")]


def test_ingest_gate_without_key_keeps_batch_dupes(spark):
    from hashio_spark.operators.dedupe import ingest_gate

    seen = spark.createDataFrame([("d1",)], "digest string")
    incoming = spark.createDataFrame(
        [(11, "d2"), (12, "d2")], "doc_id long, digest string"
    )
    assert ingest_gate(incoming, seen).count() == 2


def test_duplicate_ngrams_span_detection(spark):
    import pandas as pd

    rows = [
        # d1/d2 share the exact boilerplate span "all rights reserved by acme"
        ("d1", "intro words all rights reserved by acme more text"),
        ("d2", "different opening all rights reserved by acme trailing"),
        ("d3", "no overlap here at all with anything else whatsoever"),
        # d4 repeats a span twice WITHIN itself only -> excluded (1 doc)
        ("d4", "spam spam spam spam spam spam spam spam"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r["gram"]: r for r in D.duplicate_ngrams(df, k=4, min_docs=2).collect()}
    # the shared 5-token boilerplate yields two overlapping 4-gram spans
    assert set(out) == {"all rights reserved by", "rights reserved by acme"}
    for g in out.values():
        assert g["n_docs"] == 2 and g["n_occurrences"] == 2
    # d4's within-doc repeats ARE counted once min_docs is met elsewhere:
    hashed = D.duplicate_ngrams(df, k=4, min_docs=1, hashed=True)
    row = [r for r in hashed.collect() if r["n_occurrences"] == 5]
    assert len(row) == 1 and row[0]["n_docs"] == 1  # "spam spam spam spam" x5


def test_kmeans_refine_recovers_cluster_centers(spark):
    """Lloyd refinement (spherical) must move a hash-sampled codebook
    onto the true cluster structure: after refinement each refined
    centroid sits near ONE true center, all clusters stay covered, and
    assignment equals the planted labels."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    centers = {0: rng.normal(0, 1, 16), 1: rng.normal(9, 1, 16), 2: rng.normal(-9, 1, 16)}
    rows = []
    for i in range(120):
        c = i // 40
        rows.append((i, (centers[c] + rng.normal(0, 0.05, 16)).astype("float32").tolist()))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    emb = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")

    # over-provisioned codebook (n_list > k, the real IVF regime): a
    # 3-point sample covers 3 clusters only ~22% of the time, and plain
    # Lloyd cannot recover from a doubled cluster — IVF always picks
    # n_list >> natural cluster count
    init = S.ivf_centroids(emb, "vec_id", "embedding", n_list=9)
    refined = S.kmeans_refine(emb, "embedding", init, n_iters=4)
    assert len(refined) == 9 and all(len(c) == 16 for c in refined)

    # each refined centroid must be within noise distance of a true center
    covered = set()
    for cvec in refined:
        d = {k: float(np.linalg.norm(np.array(cvec) - centers[k])) for k in centers}
        best = min(d, key=d.get)
        assert d[best] < 0.5, f"refined centroid far from every center: {d}"
        covered.add(best)
    assert covered == {0, 1, 2}

    # determinism: same input, same codebook
    again = S.kmeans_refine(emb, "embedding", init, n_iters=4)
    assert refined == again

    # end-to-end: ivf_topk(refine_iters=...) at n_probe=1 stays in-cluster
    q = emb.filter(F.col("vec_id") == 85)
    out = S.ivf_topk(emb, q, "vec_id", "embedding", k=3, n_list=9, n_probe=1,
                     refine_iters=3).collect()
    assert out and all(80 <= r["neighbor_id"] < 120 for r in out)


def test_kmeans_refine_empty_list_keeps_previous_centroid(spark):
    import pandas as pd

    # two tight identical points; 3 centroids, one will own nothing
    pdf = pd.DataFrame([(0, [1.0, 0.0]), (1, [1.0, 0.01])], columns=["vec_id", "embedding"])
    emb = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    init = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    refined = S.kmeans_refine(emb, "embedding", init, n_iters=2)
    assert len(refined) == 3
    assert refined[2] == [-1.0, 0.0]  # empty list -> previous centroid kept
    with pytest.raises(ValueError):
        S.kmeans_refine(emb, "embedding", [], n_iters=1)


def test_ngram_containment_detects_full_embedding(spark, tmp_path):
    """A doc whose shingle set is a strict subset of another's scores
    containment 1.0 on its side (the excerpt case Jaccard understates)."""
    from hashio_spark.queries import REGISTRY

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta omega")],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = REGISTRY["ngram_containment"][0](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.containment_a == 1.0  # every A-shingle present in B
    assert r.containment_b == 0.8  # 4 of B's 5 shingles in A


def test_dedupe_normalized_catches_case_punct_variants(spark):
    """The mangled-copy fixture: exact digest dedup over the augmented
    corpus finds NOTHING, normalized dedup finds exactly n_docs/50 pairs."""
    from hashio_spark.queries import REGISTRY

    rows = REGISTRY["dedupe_normalized"][0](spark, "/root/testdata/sf0.001").collect()
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = d.count()
    expected = len([1 for (i,) in d.select("doc_id").collect() if i % 50 == 0])
    assert len(rows) == expected and all(r.n_docs == 2 for r in rows)
    mang = d.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("!!  ")).alias("text"))
    aug = d.select("doc_id", "text").unionByName(mang)
    assert aug.groupBy(F.md5("text")).count().filter("count >= 2").count() == 0
