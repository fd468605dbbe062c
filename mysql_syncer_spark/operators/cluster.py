"""Connected components over near-duplicate pair lists → dedup clusters.

The missing last step of every fuzzy-dedup pipeline: MinHash-LSH /
SimHash banding emit PAIRS, but retention decisions need CLUSTERS
(doc A ~ B, B ~ C ⇒ {A,B,C} keep one). This is connected components on
the similarity graph.

Algorithm: iterative min-label propagation WITH pointer jumping,
expressed as DataFrame ops. A hop (edges × labels join + groupBy(min))
extends a node's knowledge by one edge; a jump (labels × labels join)
chases ``label(label(u))``, roughly doubling the distance already
covered — the PRAM-CC / Kiveris-et-al shortcut that turns O(diameter)
rounds into O(log diameter). Quasi-clique dedup graphs (LSH emits most
intra-cluster pairs directly) converge in one round; chain-shaped
graphs (A~B~C~… transitive near-dup runs, which DO occur in real
corpora — the sf0.1 fixture has diameter ~12 components) in
log-many. ``max_iter`` bounds adversarial cases.

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
    # near-dup edge lists are many orders of magnitude smaller than the
    # corpus that produced them; after materialization, shrink the
    # iteration's parallelism to match the DATA (count is ~free on a
    # checkpointed frame). coalesce = no shuffle; at real scale the
    # count keeps full parallelism and this is a no-op.
    parallelism = pairs.sparkSession.sparkContext.defaultParallelism
    target = max(1, min(parallelism, edges.count() // 100_000 + 1))
    if target < edges.rdd.getNumPartitions():
        edges = edges.coalesce(target)

    labels = (
        edges.select("src").distinct()
        .withColumn("label", F.col("src"))
        .localCheckpoint(eager=True)
    )

    def hop(frame: DataFrame) -> DataFrame:
        # min label over self ∪ neighbors as ONE union + groupBy(min):
        # 2 shuffles per hop (edges⋈labels on dst, groupBy on src) vs 3
        # for a join+agg+left-join formulation. Reach grows +1 hop.
        nbr = edges.join(
            frame.select(F.col("src").alias("dst"), "label"), on="dst"
        ).select("src", "label")
        return (
            frame.select("src", "label")
            .unionByName(nbr)
            .groupBy("src")
            .agg(F.min("label").alias("label"))
        )

    def jump(frame: DataFrame) -> DataFrame:
        # pointer jumping: label(u) ← label(label(u)). Every label IS a
        # node id (the min seen so far), so chasing it one step roughly
        # DOUBLES the distance already covered — chains converge in
        # O(log diameter) rounds instead of O(diameter) (the standard
        # shortcut from PRAM CC / Kiveris et al.'s star contraction).
        # Left join + coalesce: a label that is its component's current
        # root maps to itself.
        chase = frame.select(
            F.col("src").alias("__l_src"), F.col("label").alias("__l_label")
        )
        return (
            frame.join(chase, frame.label == F.col("__l_src"), "left")
            .select(
                "src", F.coalesce("__l_label", "label").alias("label")
            )
        )

    for _ in range(max_iter):
        # per materialization round: hop→jump→hop→jump (covered
        # distance ~4× per round on chains, one round on quasi-cliques),
        # then an EDGE-CONSISTENCY convergence test: labels are final
        # iff label(u) == label(v) on every edge (uniform labels within
        # a component are necessarily the component min, since the min
        # node's own label never rises). Unlike no-change detection,
        # this certifies convergence the same round it happens.
        labels = jump(hop(jump(hop(labels)))).localCheckpoint(eager=True)
        inconsistent = (
            edges.join(labels, on="src")
            .join(
                labels.select(
                    F.col("src").alias("dst"), F.col("label").alias("label_d")
                ),
                on="dst",
            )
            .where(F.col("label") != F.col("label_d"))
        )
        if inconsistent.isEmpty():
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
