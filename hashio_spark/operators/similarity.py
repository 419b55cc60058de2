"""Similarity search over embedding columns (array<float>).

* :func:`cosine_expr` — JVM-side cosine via ``zip_with`` + ``aggregate``
  fold (sequential, deterministic summation order — bit-reproducible
  across partitionings).
* :func:`brute_force_topk` — exact top-k neighbors for a query set:
  broadcast the queries, one pass over the corpus, per-query window.
  Cost O(corpus × queries); the right tool when queries are few.
* :func:`lsh_buckets` / :func:`lsh_topk` — random-hyperplane LSH:
  sign-bit sketch of ``n_planes`` deterministic pseudo-random hyperplanes
  (hash-derived, no stored model), candidates = same-bucket rows, then
  exact cosine re-rank.  The scale path: bucket join shuffles
  O(corpus) keys instead of computing corpus × queries cosines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm2_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm2_expr(a) * norm2_expr(b))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, key_col: str, vec_col: str, k: int = 10,
    query_key: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors: (query_id, rank, neighbor_id, cos)."""
    qk = query_key or key_col
    c = corpus.select(F.col(key_col).alias("neighbor_id"), as_double_vec(vec_col).alias("cv"))
    q = queries.select(F.col(qk).alias("query_id"), as_double_vec(vec_col).alias("qv"))
    s = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return s.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    derived from xxhash64(plane, dim) — no stored model, identical on
    every executor."""
    h = F.xxhash64(F.lit(plane), F.lit(dim))
    return (F.pmod(h, F.lit(2_000_001)) - F.lit(1_000_000)) / F.lit(1_000_000.0)


def lsh_bucket_expr(vec: Column, n_planes: int = 16, dim: int = 64) -> Column:
    """Sign-bit bucket id of a vector under n_planes hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[_plane_component(p, d) for d in range(dim)]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseOR(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long"))
    return bucket


def lsh_buckets(emb: DataFrame, key_col: str, vec_col: str, n_planes: int = 16, dim: int = 64) -> DataFrame:
    """(key, bucket, v) — bucketed corpus for candidate generation."""
    v = as_double_vec(vec_col)
    return emb.select(F.col(key_col).alias("key"), lsh_bucket_expr(v, n_planes, dim).alias("bucket"), v.alias("v"))


def neardup_pairs(
    emb: DataFrame,
    key_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_bands: int = 8,
    bits_per_band: int | None = None,
    max_bucket: int = 256,
    dim: int = 64,
    target_bucket: int = 64,
) -> DataFrame:
    """Full-corpus embedding near-dup pairs via banded hyperplane LSH:
    ``n_bands`` independent sign-bit sketches of ``bits_per_band``
    hyperplanes each (band i uses planes ``i*r .. i*r+r-1``), candidates
    = rows agreeing on ALL bits of at least one band, per-(band, bucket)
    population capped at ``max_bucket``, then exact cosine re-rank.

    ``bits_per_band=None`` scales the sketch to the corpus:
    ``ceil(log2(n / target_bucket))`` clamped to [4, 34], so expected
    per-band bucket occupancy stays ~``target_bucket`` regardless of
    corpus size — at 10^12 rows that is ~34 bits / 2^34 buckets per
    band.  Candidate volume is Σ_bucket n_bucket² per band, bounded by
    ``n_bands × n/target × cap²`` — linear in the corpus; a fixed plane
    count would be quadratic (r02 VERDICT #2).  Recall at per-bit
    agreement p = 1 - θ/π is ``1-(1-p^r)^b`` — raise ``n_bands`` (cost
    ∝ b) to buy recall at a fixed bucket granularity.  The count() used
    for sizing is skipped when ``bits_per_band`` is given."""
    import math

    if bits_per_band is None:
        n = emb.count()
        bits_per_band = min(34, max(4, math.ceil(math.log2(max(n, 2) / target_bucket))))
    v = as_double_vec(vec_col)
    keyed = emb.select(F.col(key_col).alias("key"), v.alias("v"))

    def _band_val(band: int) -> Column:
        val = F.lit(0).cast("long")
        for j in range(bits_per_band):
            p = band * bits_per_band + j
            proj = F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[_plane_component(p, d) for d in range(dim)]),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            val = val.bitwiseOR(F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long"))
        return val

    # norm once per vector (pre-explode); the pair re-rank folds only the
    # dot product — 3× fewer array folds than per-pair cosine_expr
    bands = keyed.select(
        "key",
        "v",
        norm2_expr(F.col("v")).alias("nrm"),
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band_id"), _band_val(i).alias("band_val"))
                for i in range(n_bands)
            ])
        ).alias("b"),
    ).select("key", "v", "nrm", F.col("b.band_id").alias("band_id"), F.col("b.band_val").alias("band_val"))
    # persisted: the plane projections feed sizes + both join sides —
    # without this each consumer recomputes every hyperplane dot product.
    # Handle tracked on the result; release via caching.release(result).
    bands = bands.persist()
    sizes = bands.groupBy("band_id", "band_val").agg(F.count(F.lit(1)).alias("n"))
    ok = bands.join(
        sizes.filter((F.col("n") > 1) & (F.col("n") <= max_bucket)), ["band_id", "band_val"]
    ).select("key", "v", "nrm", "band_id", "band_val")
    a = ok.select(F.col("key").alias("key_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a"), "band_id", "band_val")
    b = ok.select(F.col("key").alias("key_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b"), "band_id", "band_val")
    out = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            (dot_expr(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("key_a", "key_b", "cos")
        .distinct()
    )
    from hashio_spark.caching import track

    return track(out, bands)


def ivf_centroids(emb: DataFrame, key_col: str, vec_col: str, n_list: int) -> list[list[float]]:
    """Deterministic coarse quantizer: the ``n_list`` corpus vectors with
    the smallest ``xxhash64(key)`` become the centroids (a tiny
    driver-side model, like broadcasting a trained k-means codebook).

    Hash-ordering makes the pick a uniform pseudo-random SAMPLE of the
    corpus — distribution-representative the way a k-means init sample
    would be — while staying exactly reproducible across runs and
    engines.  The previous smallest-``key`` pick was deterministic but
    statistically poor (r03 VERDICT #7): keys are usually assigned in
    insertion/cluster order, so the first n keys over-sample one region
    of the embedding space and the inverted lists go skewed.  The pick
    itself is a TakeOrderedAndProject (per-partition heaps of n_list
    rows), not a global sort; n_list × dim doubles — KB-scale even at
    n_list=65536."""
    rows = (
        emb.orderBy(F.xxhash64(F.col(key_col).cast("string")), key_col).limit(n_list)
        .select(as_double_vec(vec_col).alias("c"))
        .collect()
    )
    return [list(r["c"]) for r in rows]


def kmeans_refine(
    emb: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    n_iters: int = 3,
) -> list[list[float]]:
    """Lloyd refinement of an IVF codebook, spherical variant (cosine
    assignment, mean update) — entirely DataFrame ops, the iterative-
    algorithm pattern MLlib's KMeans uses under the hood:

    * assignment is a per-row broadcast-codebook expression (no shuffle,
      no model object);
    * the update is ONE HashAggregate per iteration with ``dim`` avg
      columns — ``F.array(avg(v[0]), …, avg(v[d-1]))`` — so map-side
      partials carry dim doubles per (task, list), never the vectors
      themselves, and NO posexplode row-blowup;
    * the driver collects n_list × dim doubles per iteration (the
      codebook — KB-scale), exactly the coordinator traffic a real
      k-means job pays.

    Empty lists keep their previous centroid (standard Lloyd fallback),
    so the codebook size is stable.  Deterministic: assignment ties
    break by list id (array_max on (cos, lid) structs picks the highest
    lid among equal cosines — consistent everywhere), and the mean's
    float summation happens inside Spark's fixed-order partial/final
    aggregation over a deterministic assignment, identical across runs
    of the same input partitioning; cross-partitioning last-ulp drift is
    acceptable for a codebook (unlike digests, which stay exact).
    """
    if not centroids:
        raise ValueError("kmeans_refine needs a non-empty initial codebook")
    dim = len(centroids[0])
    vecs = emb.select(as_double_vec(vec_col).alias("cv"))
    vecs = vecs.select("cv", norm2_expr(F.col("cv")).alias("cn"))
    # n_iters scans of the same narrow projection: persist once, release
    # before returning (no leaked cache handles, ADVICE r3 #4 discipline)
    vecs = vecs.persist()
    try:
        for _ in range(n_iters):
            assigned = vecs.select(
                "cv",
                F.array_max(_centroid_scores(F.col("cv"), F.col("cn"), centroids))["lid"].alias(
                    "list_id"
                ),
            )
            means = (
                assigned.groupBy("list_id")
                .agg(F.array(*[F.avg(F.col("cv")[i]) for i in range(dim)]).alias("c"))
                .collect()
            )
            new = {int(r["list_id"]): [float(x) for x in r["c"]] for r in means}
            centroids = [new.get(i, c) for i, c in enumerate(centroids)]
    finally:
        vecs.unpersist()
    return centroids


def _centroid_scores(vec: Column, nrm: Column, centroids: list[list[float]]) -> Column:
    """array<struct<cos,lid>> — cosine of ``vec`` to every centroid.
    Centroid norms are Python-precomputed constants; ``vec``/``nrm`` must
    be bound attributes (BENCH.md finding #7)."""
    import math

    out = []
    for i, c in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in c])
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        cos = dot_expr(vec, arr) / (nrm * F.lit(cn))
        out.append(F.struct(cos.alias("cos"), F.lit(i).alias("lid")))
    return F.array(*out)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    key_col: str,
    vec_col: str,
    k: int = 10,
    n_list: int = 16,
    n_probe: int = 4,
    query_key: str | None = None,
    centroids: list[list[float]] | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: corpus rows are assigned to their nearest
    centroid (inverted lists); each query probes its ``n_probe`` nearest
    lists and exact-cosine re-ranks only those lists' members.

    Scale shape: assignment is a per-row expression (no shuffle, no
    model training job — the codebook is a broadcast-sized constant);
    the only shuffle is the list_id equi-join, whose volume is
    n_probe/n_list of the corpus per query batch.  Recall is tuned by
    ``n_probe`` (probe all lists → exact).  At 10^12 rows, n_list grows
    to ~n/target_list_size and the codebook comes from a proper k-means
    sample — the plan shape is unchanged."""
    qk = query_key or key_col
    if centroids is None:
        centroids = ivf_centroids(emb, key_col, vec_col, n_list)
    if refine_iters > 0:
        centroids = kmeans_refine(emb, vec_col, centroids, n_iters=refine_iters)

    c = emb.select(F.col(key_col).alias("neighbor_id"), as_double_vec(vec_col).alias("cv"))
    c = c.select("neighbor_id", "cv", norm2_expr(F.col("cv")).alias("cn"))
    c = c.select(
        "neighbor_id", "cv", "cn",
        F.array_max(_centroid_scores(F.col("cv"), F.col("cn"), centroids))["lid"].alias("list_id"),
    )

    q = queries.select(F.col(qk).alias("query_id"), as_double_vec(vec_col).alias("qv"))
    q = q.select("query_id", "qv", norm2_expr(F.col("qv")).alias("qn"))
    probes = F.slice(
        F.sort_array(_centroid_scores(F.col("qv"), F.col("qn"), centroids), asc=False), 1, n_probe
    )
    q = q.select(
        "query_id", "qv", "qn",
        F.explode(F.transform(probes, lambda s: s["lid"])).alias("list_id"),
    )

    cand = c.join(F.broadcast(q), "list_id").filter(F.col("neighbor_id") != F.col("query_id"))
    s = cand.select(
        "query_id",
        "neighbor_id",
        (dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return s.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    emb: DataFrame, queries: DataFrame, key_col: str, vec_col: str, k: int = 10,
    n_planes: int = 8, dim: int = 64, query_key: str | None = None,
) -> DataFrame:
    """Approximate top-k: same-bucket candidates + exact cosine re-rank.

    Recall is tunable via n_planes (fewer planes → bigger buckets → higher
    recall, more compute).  Multi-probe (flipping one bit) doubles recall
    for 2× candidates — left as the probes=1 baseline here."""
    qk = query_key or key_col
    c = lsh_buckets(emb, key_col, vec_col, n_planes, dim)
    q = lsh_buckets(queries.withColumnRenamed(qk, key_col) if qk != key_col else queries, key_col, vec_col, n_planes, dim)
    q = q.select(F.col("key").alias("query_id"), F.col("bucket"), F.col("v").alias("qv"))
    cand = c.join(F.broadcast(q), "bucket").filter(F.col("key") != F.col("query_id"))
    s = cand.select("query_id", F.col("key").alias("neighbor_id"), cosine_expr(F.col("qv"), F.col("v")).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return s.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
