"""Property-based tests (hypothesis): the JVM-replica kernels and the
ignore-pattern semantics hold over adversarial generated inputs, not just
hand-picked cases."""

import fnmatch
import re

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hashio_spark.functions.xxh import spark_xxhash64_str, xxh64_intdigest


# -- driver-side kernel properties (no Spark session needed) ------------


@given(st.binary(min_size=0, max_size=600), st.integers(min_value=0, max_value=2**64 - 1))
def test_xxh64_seed_and_data_sensitivity(data, seed):
    h = xxh64_intdigest(data, seed)
    assert 0 <= h < 2**64
    # appending a byte always changes the digest (xxh64 is length-mixed)
    assert xxh64_intdigest(data + b"\x00", seed) != h


@given(st.text(min_size=0, max_size=300))
def test_spark_xxhash64_replica_is_signed_xxh64_seed42(s):
    h = spark_xxhash64_str(s)
    assert -(2**63) <= h < 2**63
    unsigned = h + (1 << 64) if h < 0 else h
    assert unsigned == xxh64_intdigest(s.encode("utf-8"), 42)


# -- Spark-side properties (one job over a generated batch) -------------

_PATTERNS = ("*.pyc", ".git", ".git/*", ".#*", "*~", "desktop.ini", ".cache", ".cache/*")


def _ref_ignored(path: str) -> bool:
    """Model of the documented semantics (ignore.py docstring): bare
    patterns full-match any segment-aligned SPAN of the path (a glob's
    ``*`` is dotall, so ``venv*`` also swallows everything under a
    ``venvX/`` directory); '/'-patterns full-match any segment-aligned
    suffix.  Deliberately NOT the reference's raw suffix search — see the
    divergence note in ignore.py."""
    parts = path.split("/")
    spans = [
        "/".join(parts[i:j])
        for i in range(len(parts))
        for j in range(i + 1, len(parts) + 1)
    ]
    suffixes = ["/".join(parts[i:]) for i in range(len(parts))]
    for p in _PATTERNS:
        cands = spans if "/" not in p else suffixes
        if any(fnmatch.fnmatchcase(c, p) for c in cands):
            return True
    return False


_seg = st.one_of(
    st.text(alphabet=list("abcZ09._#~-"), min_size=1, max_size=8),
    st.sampled_from([".git", ".cache", "a.pyc", "x.git", "b~", ".#c", "desktop.ini", "git"]),
)
_paths = st.lists(_seg, min_size=1, max_size=4).map("/".join)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_paths, min_size=1, max_size=40, unique=True))
def test_ignore_predicate_matches_fnmatch_reference(spark, paths):
    from hashio_spark.operators.ignore import ignore_predicate

    df = spark.createDataFrame(pd.DataFrame({"path": paths}))
    got = {
        r["path"]: r["ig"]
        for r in df.select("path", ignore_predicate("path", _PATTERNS).alias("ig")).collect()
    }
    expected = {p: _ref_ignored(p) for p in paths}
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.text(alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=60),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
def test_builtin_xxhash64_matches_replica_on_random_unicode(spark, texts):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({"s": texts}))
    rows = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in texts:
        assert rows[s] == spark_xxhash64_str(s)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=list("abc012"), min_size=0, max_size=6),
            st.text(alphabet=list("0123456789abcdef"), min_size=4, max_size=8),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_composite_digest_matches_python_replica(spark, pairs):
    """composite_digest_expr == the reference formula computed driver-side:
    md5 over '\\n'.join(f'{key}:{hash}') with pairs tuple-sorted
    (encoder.py:447-460 semantics) — for arbitrary generated groups,
    including duplicate keys and empty strings."""
    import hashlib

    from hashio_spark.functions.canonical import composite_digest_expr

    pdf = pd.DataFrame(pairs, columns=["k", "h"])
    df = spark.createDataFrame(pdf)
    got = df.agg(composite_digest_expr("k", "h", "md5").alias("d")).first()["d"]
    lines = "\n".join(f"{k}:{h}" for k, h in sorted(pairs))
    assert got == hashlib.md5(lines.encode()).hexdigest()


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=25),
)
def test_asof_join_matches_python_model(spark, lrows, rrows):
    """asof_join (union-timeline plan) == the point-in-time model: for
    each left row, the right row with max (ts, rid) among same-key rows
    at-or-before it — over generated frames with heavy key/ts ties."""
    from hashio_spark.operators.asof import asof_join

    left = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], columns=["lid", "k", "lt"]
    )
    right = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(rrows)], columns=["rid", "k", "rt"]
    )
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right) if len(right) else
        spark.createDataFrame([], "rid long, k long, rt long"),
        "k", "k", "lt", "rt", ["rid"],
    )
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    for lid, (k, lt) in enumerate(lrows):
        cands = [(rt, rid) for rid, (rk, rt) in enumerate(rrows) if rk == k and rt <= lt]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, k, lt)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.integers(1, 120), min_size=1, max_size=40),
    st.integers(16, 256),
    st.integers(1, 4),
)
def test_pack_sequences_matches_python_model(spark, tokens, budget, n_shards):
    """pack_sequences == the streaming prefix-sum model per shard, for
    generated token counts, budgets, and shard counts."""
    from pyspark.sql import functions as F

    from hashio_spark.operators.packing import pack_sequences

    pdf = pd.DataFrame({"doc_id": range(len(tokens)), "n_tokens": tokens})
    out = pack_sequences(
        spark.createDataFrame(pdf), "doc_id", "n_tokens", budget, n_shards,
        shard_expr=F.pmod(F.col("doc_id"), F.lit(n_shards)),
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == len(tokens)
    cum = {}
    pos = {}
    for doc_id in range(len(tokens)):
        shard = doc_id % n_shards
        c = cum.get(shard, 0)
        r = rows[doc_id]
        assert r["shard"] == shard
        assert r["cum_before"] == c
        assert r["seq_id"] == c // budget
        p = pos.get((shard, c // budget), 0) + 1
        pos[(shard, c // budget)] = p
        assert r["pos"] == p
        cum[shard] = c + tokens[doc_id]


# -- ingest-gate algebra (the laws that make incremental ingest safe) ---

_gate_texts = st.lists(
    st.text(alphabet=list("abc "), min_size=0, max_size=6), min_size=1, max_size=25
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_gate_texts, st.lists(st.text(alphabet=list("abc "), max_size=6), max_size=8))
def test_ingest_gate_idempotent_and_composable(spark, texts, seen_texts):
    """gate(gate(X, S), S) == gate(X, S)  (idempotency: a re-run of the
    same increment adds nothing) and chaining equals a union seen-set:
    gate(X, A ∪ out-digests) == ∅ when X was already gated through A —
    exactly the invariant the streaming sink and CLI chaining rely on."""
    import hashlib

    from pyspark.sql import functions as F

    from hashio_spark.operators.dedupe import ingest_gate

    rows = [(i, t) for i, t in enumerate(texts)]
    inc = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("digest")
    )
    seen = spark.createDataFrame(
        [(hashlib.md5(t.encode()).hexdigest(),) for t in seen_texts] or [("-",)],
        "digest string",
    )
    once = ingest_gate(inc, seen, key_col="doc_id")
    got = sorted((r.doc_id, r.digest) for r in once.collect())

    # python model: first doc_id per unseen digest
    seen_set = {hashlib.md5(t.encode()).hexdigest() for t in seen_texts}
    model, used = [], set()
    for i, t in rows:
        d = hashlib.md5(t.encode()).hexdigest()
        if d in seen_set or d in used:
            continue
        used.add(d)
        model.append((i, d))
    assert got == sorted(model)

    # idempotency: re-gating the output against the same seen set is a no-op
    again = ingest_gate(once, seen, key_col="doc_id")
    assert sorted((r.doc_id, r.digest) for r in again.collect()) == got

    # composition: gating the batch against seen ∪ output digests yields nothing
    combined = seen.unionByName(once.select("digest"))
    assert ingest_gate(inc, combined, key_col="doc_id").count() == 0
