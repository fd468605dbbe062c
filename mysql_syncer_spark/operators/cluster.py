"""Connected components over near-duplicate pair lists → dedup clusters.

The missing last step of every fuzzy-dedup pipeline: MinHash-LSH /
SimHash banding emit PAIRS, but retention decisions need CLUSTERS
(doc A ~ B, B ~ C ⇒ {A,B,C} keep one). This is connected components on
the similarity graph.

Algorithm: iterative min-label propagation expressed as DataFrame ops —
each round is one equi-join (edges × labels) + one groupBy(min); a
node's label converges to the smallest doc id reachable from it. Rounds
needed = graph diameter; near-dup graphs are unions of quasi-cliques
(LSH emits most intra-cluster pairs directly), so 2-3 rounds converge
in practice. ``max_iter`` bounds pathological chains — at 100 TB you'd
switch to the large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce", same join/groupBy primitives,
O(log n) rounds); the round structure here is deliberately the simple
variant because dedup graphs are shallow.

Iterative DataFrame algorithms need per-round materialization — without
it round k's DAG re-executes rounds 1..k-1 (exponential blowup) — and
lineage truncation. ``localCheckpoint(eager=True)`` does both WITHOUT
registering anything in the session cache manager: blocks are freed by
the ContextCleaner when the round's frame is garbage collected, so
nothing leaks across a long session (the round-1 lesson about leaked
``persist()``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster assignment for every node appearing in ``pairs``:
    ``(doc_id, cluster_id)`` where cluster_id = min doc id of the
    connected component. Nodes in no pair are (by definition) their own
    singleton cluster and are not emitted.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = fwd.unionByName(rev).distinct().localCheckpoint(eager=True)

    labels = (
        edges.select("src").distinct()
        .withColumn("label", F.col("src"))
        .localCheckpoint(eager=True)
    )

    def hop(frame: DataFrame) -> DataFrame:
        # min label over neighbors folded into the node's own label with
        # a left join + least() — one shuffle join, carries extra
        # columns (label0) through untouched
        nbr_min = (
            edges.join(
                frame.select(F.col("src").alias("dst"), "label"), on="dst"
            )
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        return frame.join(nbr_min, on="src", how="left").withColumn(
            "label", F.least(F.col("label"), F.coalesce("nbr_label", "label"))
        ).drop("nbr_label")

    for _ in range(max_iter):
        # TWO propagation hops per materialization round: rounds needed
        # drop to ceil(diameter/2) and — the dominant cost on shallow
        # dedup graphs — the per-round action overhead (checkpoint +
        # convergence count) is paid half as often. The convergence flag
        # (label moved vs round start) rides along as a column, so
        # checking it re-scans the just-checkpointed blocks instead of
        # running a second join.
        stepped = hop(hop(labels.withColumn("label0", F.col("label"))))
        new_labels = stepped.select(
            "src", "label", (F.col("label") < F.col("label0")).alias("changed")
        ).localCheckpoint(eager=True)
        changed = new_labels.where("changed").count()
        labels = new_labels.drop("changed")
        if changed == 0:
            return labels.select(
                F.col("src").alias("doc_id"), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(
        f"connected components did not converge in {max_iter} rounds — "
        "graph diameter exceeds the bound; raise max_iter or switch to "
        "star-contraction for chain-shaped graphs"
    )


def cluster_survivors(
    clusters: DataFrame,
    keep: str = "min",
) -> DataFrame:
    """Retention decision per cluster: ``(cluster_id, keep_id, n_docs)``.
    ``keep='min'`` is the deterministic min-id policy (matches
    dedup.exact_duplicates); cluster_id already IS the min label, so
    this is a count-only groupBy."""
    if keep != "min":
        raise ValueError(f"unsupported keep policy: {keep!r}")
    return clusters.groupBy("cluster_id").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def dedup_by_clusters(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every clustered doc except its cluster's min-id survivor —
    one broadcast-able anti-join of the (small) victim list against the
    corpus. Unclustered docs pass through untouched."""
    victims = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(victims, on=id_col, how="left_anti")
