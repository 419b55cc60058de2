"""Connected components over candidate-pair graphs — duplicate-cluster
resolution.

LSH/SimHash emit near-dup PAIRS; to actually deduplicate a corpus you
need the transitive clusters (keep one representative per component,
drop the rest).  This is the min-label-propagation algorithm as an
iterative DataFrame program:

* every node starts labeled with itself;
* each round, a node's label becomes the min of its own and its
  neighbors' labels (one symmetric edge join + one min-aggregation —
  two shuffles per round);
* stop when a round changes nothing (the convergence check is an O(1)
  count action per round, not a collect of the labels).

Rounds needed = the graph diameter.  Near-dup graphs are unions of
near-cliques (all members of an LSH bucket pair with each other), so the
diameter is tiny (2-4) and this beats the asymptotically-better
star-contraction algorithms (Kiveris et al., "Connected Components in
MapReduce and Beyond") on constants; for adversarially chained graphs
set ``max_iter`` accordingly or contract first.  Each round's labels are
persisted and the previous round unpersisted, so executor memory holds
two label sets regardless of round count; lineage depth grows linearly
with rounds, bounded by ``max_iter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node in ``edges``; ``component`` is
    the smallest node id reachable from it.  Nodes are whatever type the
    edge columns are; isolated nodes (absent from ``edges``) are absent
    from the output — union them in with their own id if needed."""
    a, b = F.col(src), F.col(dst)
    sym = (
        edges.select(a.alias("n"), b.alias("m"))
        .unionByName(edges.select(b.alias("n"), a.alias("m")))
        .distinct()
        .persist()
    )
    labels = sym.select("n").distinct().select(F.col("n"), F.col("n").alias("label")).persist()
    labels.count()
    try:
        for _ in range(max_iter):
            cand = (
                sym.join(labels.withColumnRenamed("n", "m"), "m")
                .groupBy("n")
                .agg(F.min("label").alias("_nbr"))
            )
            # carry the previous label through the update so convergence is
            # a filter-count on the (persisted) new frame — not an extra
            # join back against the old labels (one fewer shuffle/round)
            new_labels = (
                labels.join(cand, "n", "left_outer")
                .select(
                    "n",
                    F.col("label").alias("_old"),
                    F.least(F.col("label"), F.coalesce(F.col("_nbr"), F.col("label"))).alias("label"),
                )
                .persist()
            )
            changed = new_labels.filter(F.col("label") != F.col("_old")).count()
            labels.unpersist()
            # keep the PERSISTED frame itself (unpersist on a .drop()
            # projection would not release the cache); the stray _old
            # column is projected away by the next round / final select
            labels = new_labels
            if changed == 0:
                break
        out = labels.select(F.col("n").alias("node"), F.col("label").alias("component"))
        # the final round's labels stay persisted (they back the returned
        # plan); hand the caller the release handle (caching.release)
        from hashio_spark.caching import track

        return track(out, labels)
    finally:
        sym.unpersist()


def duplicate_clusters(pairs: DataFrame, key_a: str, key_b: str) -> DataFrame:
    """(key, cluster_id, keep) from near-dup pairs: cluster_id is the
    min key of the component, ``keep`` marks the one representative —
    the corpus-side drop list is ``filter(~keep)``."""
    from hashio_spark.caching import track

    cc = connected_components(pairs, key_a, key_b)
    out = cc.select(
        F.col("node").alias("key"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("keep"),
    )
    return track(out, *getattr(cc, "_hashio_persisted", ()))
