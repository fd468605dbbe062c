"""Connected components over near-duplicate pair lists → dedup clusters.

The missing last step of every fuzzy-dedup pipeline: MinHash-LSH /
SimHash banding emit PAIRS, but retention decisions need CLUSTERS
(doc A ~ B, B ~ C ⇒ {A,B,C} keep one). This is connected components on
the similarity graph.

Structure (two phases, sized for LSH similarity graphs, which are
clique-heavy — banding emits most intra-cluster pairs directly):

1. **Distributed one-hop contraction.** ``l0(u) = min(u, neighbors)``
   is one groupBy over the edge list; re-keying every edge by its
   endpoint labels collapses each quasi-clique to a point. This is the
   step that must scale — at 100 TB the edge list is billions of rows
   — and it's plain shuffles on (src) / (label) keys.
2. **Remainder resolution.** What survives contraction is the
   inter-label graph: orders of magnitude smaller (chains and sparse
   bridges only; sf0.1 fixture: 383k edges → 1.3k). Under an explicit
   size bound it is finished with driver union-find + a broadcast
   map-back join (milliseconds, zero extra Spark rounds); past the
   bound, iterative min-label propagation WITH pointer jumping — a hop
   (edges × labels join + groupBy(min)) extends reach by one edge, a
   jump (label(label(u)) chase) roughly doubles covered distance — the
   PRAM-CC / Kiveris-et-al shortcut giving O(log diameter) rounds.

Iterative DataFrame algorithms need per-round materialization — without
it round k's DAG re-executes rounds 1..k-1 (exponential blowup) — and
lineage truncation. ``localCheckpoint(eager=True)`` does both WITHOUT
registering anything in the session cache manager: blocks are freed by
the ContextCleaner when the round's frame is garbage collected, so
nothing leaks across a long session (the round-1 lesson about leaked
``persist()``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from mysql_syncer_spark.pin import pin


def _union_find_codes(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
    """Array-based union-find over edge lists of dense codes ``0..n-1``:
    returns ``root[i]`` = min code of i's component. Codes must be
    order-isomorphic to the original ids (``pd.factorize(sort=True)``)
    so the min CODE root is the min ID root. Memory is two int64 arrays
    (~16 bytes/node) — no Python dict, no Row objects."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for i in range(len(a)):
        ra, rb = find(a[i]), find(b[i])
        if ra == rb:
            continue
        if ra < rb:
            parent[rb] = ra
        else:
            parent[ra] = rb
    for i in range(n):
        parent[i] = find(i)
    return parent


def _union_find_roots(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find with min-id roots: node → min id of its
    component. Thin wrapper over the array kernel (kept as the
    property-test surface: hypothesis cross-checks it against BFS)."""
    if not edges:
        return {}
    s = pd.Series([a for a, b in edges] + [b for a, b in edges])
    codes, uniques = pd.factorize(s, sort=True)
    uniques = np.asarray(uniques)
    m = len(edges)
    roots = _union_find_codes(codes[:m], codes[m:], len(uniques))
    return {uniques[i]: uniques[roots[i]] for i in range(len(uniques))}


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    driver_edge_limit: int = 2_000_000,
) -> DataFrame:
    """Cluster assignment for every node appearing in ``pairs``:
    ``(doc_id, cluster_id)`` where cluster_id = min doc id of the
    connected component. Nodes in no pair are (by definition) their own
    singleton cluster and are not emitted.

    ``driver_edge_limit`` bounds the post-contraction remainder graph
    that may be resolved with driver union-find. The collect goes
    through Arrow (``toPandas`` → dense-code numpy union-find), so the
    driver cost at the 2M default is ~32 MB of Arrow arrays plus two
    int64 parent/code arrays — no Python Row objects or dicts. A larger
    remainder takes the distributed propagation loop, which past
    ``max_iter`` rounds re-contracts the partially-labeled graph and
    recurses (each level shrinks the graph by the distance the labels
    already cover, so arbitrary-diameter chains converge). Pass ``0``
    to force the distributed path. Ids may be any orderable Spark type
    (long, string UUID, ...); the cluster id is the component min under
    that type's ordering.
    """
    spark = pairs.sparkSession
    # pin the pair list FIRST: the fwd/rev union scans it once per
    # branch, so an unpinned pairs frame re-executes its whole producer
    # pipeline (LSH banding join, simhash chunk join, cosine verify)
    # twice inside the edges materialization. The pair list is the
    # smallest frame in any dedup pipeline — pinning it is free.
    pairs = pairs.select(id_a, id_b).transform(pin)
    # Raw pair lists inside the driver budget skip the distributed
    # contraction entirely (r12): one Arrow collect + numpy union-find
    # emits the (node, component-min) frame directly — the contraction
    # phase's 4-5 blocking jobs (symmetric edge pin, l0 pin, remainder
    # pin + counts) exist to SHRINK a graph that is already
    # driver-sized. factorize(sort=True) makes code order = value
    # order, so the min-code root IS the min-id cluster label. Larger
    # graphs take the unchanged contraction + propagation path.
    if pairs.count() <= driver_edge_limit:
        pdf = pairs.toPandas()
        m = len(pdf)
        codes, uniques = pd.factorize(
            pd.concat([pdf[id_a], pdf[id_b]], ignore_index=True), sort=True
        )
        uniques = np.asarray(uniques)
        roots = _union_find_codes(codes[:m], codes[m:], len(uniques))
        id_type = pairs.schema[id_a].dataType
        out_pdf = pd.DataFrame(
            {"doc_id": uniques, "cluster_id": uniques[roots]}
        )
        schema = StructType(
            [
                StructField("doc_id", id_type),
                StructField("cluster_id", id_type),
            ]
        )
        return spark.createDataFrame(out_pdf, schema)
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    # no distinct: min-propagation and union-find are idempotent under
    # duplicate edges, and LSH pair lists are distinct by construction —
    # a dedup shuffle of the full edge list would cost more than the
    # duplicates it removes.
    edges = fwd.unionByName(rev).transform(pin)
    # near-dup edge lists are many orders of magnitude smaller than the
    # corpus that produced them; after materialization, shrink the
    # remaining work's parallelism to match the DATA (count is ~free on
    # a checkpointed frame). coalesce = no shuffle; at real scale the
    # count keeps full parallelism and this is a no-op.
    parallelism = spark.sparkContext.defaultParallelism
    target = max(1, min(parallelism, edges.count() // 100_000 + 1))
    if target < edges.rdd.getNumPartitions():
        edges = edges.coalesce(target)

    # Phase 1: one-hop contraction. One combinable groupBy(src) shuffle,
    # then each edge re-keyed by its endpoint labels; intra-clique edges
    # become self-loops and vanish.
    l0, remainder = _contract(edges)
    n_rem = remainder.count()

    if n_rem == 0:
        # pure cliques: contraction already labeled every component
        return l0.select(
            F.col("src").alias("doc_id"), F.col("label").alias("cluster_id")
        )

    mapping = _resolve(remainder, n_rem, max_iter, driver_edge_limit)
    return (
        l0.join(mapping, l0.label == F.col("__node"), "left")
        .select(
            F.col("src").alias("doc_id"),
            F.coalesce("__root", "label").alias("cluster_id"),
        )
    )


def _contract(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One-hop min contraction of a SYMMETRIC edge list: returns
    ``(labels, remainder)`` where labels = (src, label=min(self ∪
    neighbors)) for every node and remainder = the inter-label graph
    (symmetric, self-loops dropped, distinct), both materialized."""
    l0 = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("__mn"))
        .select("src", F.least(F.col("src"), F.col("__mn")).alias("label"))
        .transform(pin)
    )
    lu = l0.select(F.col("src").alias("__u"), F.col("label").alias("__lu"))
    lv = l0.select(F.col("src").alias("__v"), F.col("label").alias("__lv"))
    remainder = (
        edges.join(lu, edges.src == F.col("__u"))
        .join(lv, edges.dst == F.col("__v"))
        .where(F.col("__lu") != F.col("__lv"))
        .select(F.col("__lu").alias("src"), F.col("__lv").alias("dst"))
        .distinct()
        .transform(pin)
    )
    return l0, remainder


def _resolve(
    remainder: DataFrame,
    n_rem: int,
    max_iter: int,
    driver_edge_limit: int,
    depth: int = 0,
) -> DataFrame:
    """Root mapping ``(__node, __root)`` for every node of a non-empty
    symmetric contracted graph. Small graphs finish on the driver
    (Arrow collect + numpy union-find, id-type-generic); large ones run
    min-label propagation with pointer jumping, and past ``max_iter``
    rounds the partially-labeled graph is re-contracted and resolved
    recursively — labels cover ~4-6× more distance per round, so each
    level shrinks chain-shaped graphs geometrically and recursion depth
    is O(log diameter / max_iter)."""
    spark = remainder.sparkSession
    id_type = remainder.schema["src"].dataType

    if n_rem <= driver_edge_limit:
        pdf = remainder.toPandas()  # Arrow path: no Row objects
        m = len(pdf)
        codes, uniques = pd.factorize(
            pd.concat([pdf["src"], pdf["dst"]], ignore_index=True), sort=True
        )
        uniques = np.asarray(uniques)
        roots = _union_find_codes(codes[:m], codes[m:], len(uniques))
        map_pdf = pd.DataFrame(
            {"__node": uniques, "__root": uniques[roots]}
        )
        schema = StructType(
            [StructField("__node", id_type), StructField("__root", id_type)]
        )
        return spark.createDataFrame(map_pdf, schema).hint("broadcast")

    labels = (
        remainder.select("src").distinct()
        .withColumn("label", F.col("src"))
        .transform(pin)
    )

    def hop(frame: DataFrame) -> DataFrame:
        # min label over self ∪ neighbors as ONE union + groupBy(min):
        # 2 shuffles per hop (edges⋈labels on dst, groupBy on src) vs 3
        # for a join+agg+left-join formulation. Reach grows +1 hop.
        nbr = remainder.join(
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
        # DOUBLES the distance already covered. Left join + coalesce: a
        # label that is its component's current root maps to itself.
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
        labels = jump(hop(jump(hop(labels)))).transform(pin)
        inconsistent = (
            remainder.join(labels, on="src")
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
                F.col("src").alias("__node"), F.col("label").alias("__root")
            )

    # Not converged within the round budget: re-contract by the labels
    # accumulated so far and resolve the smaller graph recursively WITH
    # A DOUBLED ROUND BUDGET. The doubling matters on chain graphs:
    # labels reach ~4^rounds hops, but contraction only SUBTRACTS that
    # reach from a path's length (labels are min-over-a-sliding-window,
    # so a path of n nodes contracts to ~n - 4^rounds nodes, not
    # n / 4^rounds) — with a fixed budget the recursion would need
    # O(n / 4^budget) levels; with doubling, level k covers ~4^(2^k)
    # hops and any diameter converges in O(log log D) levels.
    if depth >= 64:  # unreachable in practice; guards a logic error
        raise RuntimeError("connected components: recursion bound hit")
    lu = labels.select(F.col("src").alias("__u"), F.col("label").alias("__lu"))
    lv = labels.select(F.col("src").alias("__v"), F.col("label").alias("__lv"))
    sub = (
        remainder.join(lu, remainder.src == F.col("__u"))
        .join(lv, remainder.dst == F.col("__v"))
        .where(F.col("__lu") != F.col("__lv"))
        .select(F.col("__lu").alias("src"), F.col("__lv").alias("dst"))
        .distinct()
        .transform(pin)
    )
    submap = _resolve(
        sub, sub.count(), max_iter * 2, driver_edge_limit, depth + 1
    ).select(
        F.col("__node").alias("__n2"), F.col("__root").alias("__r2")
    )
    return (
        labels.join(submap, labels.label == F.col("__n2"), "left")
        .select(
            F.col("src").alias("__node"),
            F.coalesce("__r2", "label").alias("__root"),
        )
    )


def simhash_duplicate_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int | None = None,
    max_bits: int = 3,
    hash_mode: str = "md5",
    driver_edge_limit: int = 2_000_000,
) -> DataFrame:
    """``duplicate_clusters(simhash_near_dup_pairs(df, ...))`` computed
    at DISTINCT-SIGNATURE cardinality — identical ``(doc_id,
    cluster_id)`` output without ever materializing document pairs.

    The doc-pair formulation expands every verified signature pair to
    its member-doc cross product (plus identical-signature cliques) and
    then union-find immediately re-contracts those cliques: at sf0.1
    that is ~1M expanded pairs pinned, a 2M-row symmetric edge list
    pinned, and a 2M-row contraction groupBy — all to recover component
    structure already present in the 32k signature pairs. Here
    connected components run over the signature graph (nodes =
    signatures in a verified pair OR shared by ≥ 2 docs; identical-doc
    groups are single NODES, not cliques), and docs join in by
    membership at the end. At 100 TB a mega-cluster of m identical docs
    costs m membership rows instead of m² clique edges — the same
    asymmetry the r12 banding rewrite exploited for pair GENERATION,
    applied to clustering.

    Equivalence: two docs land in one doc-level component iff their
    signatures share a signature-level component or are equal (an
    active signature is trivially in its own component), and the
    cluster label is the component-min doc id in both formulations.
    Proven output-exact vs the doc-pair path (exceptAll both ways == 0)
    in tests/test_cluster.py and at sf0.01/sf0.1 before the switch.
    """
    from mysql_syncer_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash,
        simhash_rep_pairs,
    )

    if bits is None:
        bits = SIMHASH_BITS
    spark = df.sparkSession
    sig = (
        simhash(df, id_col, text_col, bits, hash_mode)
        .select(F.col(id_col).alias("__id"), F.col("simhash").alias("__sig"))
        .transform(pin)
    )
    rep = (
        simhash_rep_pairs(sig, bits, max_bits)
        .select("__sa", "__sb")
        .transform(pin)
    )
    # counts are ~free on checkpointed frames; both gates are
    # signature-cardinality (edges and per-sig stats), the same driver
    # budget as duplicate_clusters' union-find collect
    if (
        rep.count() <= driver_edge_limit
        and sig.count() <= driver_edge_limit
    ):
        # Driver tail: per-sig (min doc, multiplicity) + the sig-pair
        # edge list both fit the driver_edge_limit budget, so the whole
        # component resolution is two Arrow collects + numpy union-find
        # + ONE broadcast membership join — no contraction rounds, no
        # label-propagation jobs, no tail shuffle chain. Roots are
        # arbitrary canonical codes (group keys only, never emitted);
        # the emitted cluster_id is the component min over per-sig min
        # doc ids, id-type-generic via pandas.
        stats = sig.groupBy("__sig").agg(
            F.min("__id").alias("__mn"), F.count(F.lit(1)).alias("__m")
        )
        spdf = stats.toPandas()
        rpdf = rep.toPandas()
        m = len(rpdf)
        codes, uniques = pd.factorize(
            pd.concat(
                [rpdf["__sa"], rpdf["__sb"], spdf["__sig"]],
                ignore_index=True,
            ),
            sort=False,
        )
        roots = _union_find_codes(codes[:m], codes[m : 2 * m], len(uniques))
        sig_code = codes[2 * m :]
        comp = roots[sig_code]
        paired = np.zeros(len(uniques), dtype=bool)
        paired[codes[: 2 * m]] = True
        active = paired[sig_code] | (spdf["__m"].to_numpy() >= 2)
        comp_min = (
            pd.Series(spdf["__mn"].to_numpy())
            .groupby(comp)
            .transform("min")
        )
        map_pdf = pd.DataFrame(
            {
                "__sig": spdf["__sig"][active],
                "cluster_id": comp_min[active],
            }
        )
        id_type = sig.schema["__id"].dataType
        schema = StructType(
            [
                StructField("__sig", sig.schema["__sig"].dataType),
                StructField("cluster_id", id_type),
            ]
        )
        mapping = spark.createDataFrame(map_pdf, schema).hint("broadcast")
        return sig.join(mapping, on="__sig").select(
            F.col("__id").alias("doc_id"), "cluster_id"
        )
    # distributed tail (signature cardinality above the driver budget):
    # components over the sig graph, then membership joins
    sig_roots = duplicate_clusters(
        rep, "__sa", "__sb", driver_edge_limit=driver_edge_limit
    ).select(
        F.col("doc_id").alias("__sig"), F.col("cluster_id").alias("__root")
    )
    # signatures shared by >= 2 docs are active (their docs pair at
    # Hamming 0) even when no OTHER signature is near them
    multi = (
        sig.groupBy("__sig")
        .agg(F.count(F.lit(1)).alias("__m"))
        .where(F.col("__m") >= 2)
        .select("__sig")
    )
    extra = multi.join(
        sig_roots.select("__sig"), on="__sig", how="left_anti"
    ).select("__sig", F.col("__sig").alias("__root"))
    roots = sig_roots.unionByName(extra)
    member = sig.join(roots, on="__sig")
    comp_min = member.groupBy("__root").agg(F.min("__id").alias("cluster_id"))
    return member.join(comp_min, on="__root").select(
        F.col("__id").alias("doc_id"), "cluster_id"
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


def cluster_keep_best(
    df: DataFrame,
    clusters: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware survivor policy: per duplicate cluster keep the
    member with the HIGHEST ``score_col`` (ties → min id) instead of
    the arbitrary min-id member. The standard curation refinement —
    when near-dups differ (one truncated, one boilerplate-wrapped, one
    clean), min-id keeps a random variant; keep-best keeps the one the
    training run actually wants.

    Scale shape: scores are looked up by joining the (small) cluster
    map against an id+score projection of the corpus — never the other
    way around — so the rank window shuffles only clustered rows, a
    tiny fraction of the corpus. The loser list then anti-joins the
    corpus (broadcast when small, shuffle otherwise). Unclustered docs
    pass through untouched. One corpus scan + one pruned-column scan.
    """
    from pyspark.sql import Window

    cl = clusters.select(F.col("doc_id").alias(id_col), "cluster_id")
    scored = cl.join(df.select(id_col, score_col), id_col)
    rank = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    losers = (
        scored.withColumn("__rn", F.row_number().over(rank))
        .where(F.col("__rn") > 1)
        .select(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def golden_records(
    df: DataFrame,
    cluster_cols: list[str],
    order_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """The third survivorship policy, for when NO single member is the
    right survivor: per cluster, ONE consolidated row whose every
    value column carries the most recent NON-NULL value (recency by
    ``order_cols``, compared lexicographically — include a unique
    tie-break column, or ties pick an arbitrary member). The classic
    MDM golden-record merge: three partial records of one entity
    (one has the email, a newer one the phone, the newest neither)
    consolidate into a row with the newest email AND the newest
    phone — which keep-best (row-pick) structurally cannot produce.

    Shape: ONE combinable groupBy over the cluster key —
    ``max_by(col, order WHERE col IS NOT NULL)`` per column, so every
    column's winner is found in the same single shuffle; no window, no
    self-join. Output: ``(cluster_cols..., value_cols..., n_records)``.
    A cluster whose column is NULL in every member stays NULL."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    overlap = (set(cluster_cols) | set(order_cols)) & set(value_cols)
    if overlap:
        raise ValueError(
            f"value_cols must not overlap cluster/order cols: "
            f"{sorted(overlap)}"
        )
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    aggs = []
    for c in value_cols:
        aggs.append(
            F.max_by(
                F.col(c), F.when(F.col(c).isNotNull(), ord_struct)
            ).alias(c)
        )
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_records"))
    return df.groupBy(*cluster_cols).agg(*aggs)


# ---------------------------------------------------------------------------
# Triangle counting / local clustering coefficient: the density measure
# over the similarity graph (E114's kNN edges, LSH pair lists) that
# separates tight duplicate cliques from hub-spoke false-positive stars.
# ---------------------------------------------------------------------------


def canonical_edges(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Undirected canonical edge list: self-loops dropped, endpoints
    ordered (a < b), duplicates (including reversed duplicates)
    collapsed — the normal form every graph operator here consumes."""
    a, b = F.col(src), F.col(dst)
    return (
        edges.where(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )


def node_degrees(cedges: DataFrame) -> DataFrame:
    """Per-node degree of a canonical edge list: one explode + one
    combinable groupBy."""
    return (
        cedges.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def triangle_counts(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-node triangle counts via the degree-ordered node-iterator
    (Suri & Vassilvitskii): orient every edge from lower to higher
    (degree, id) rank, enumerate wedges at each node's ORIENTED
    neighbor list, close them against the oriented edge set. The
    orientation is what makes this scale: every wedge is generated at
    its lowest-rank vertex, so per-node work is (out-degree choose 2)
    with out-degree bounded by ~sqrt(m) on any graph — and by k on a
    kNN graph — never (degree choose 2) at the hubs. Each triangle
    arises exactly once. Three linear joins, all on edge keys; the
    result is orientation-independent (the id-ordered DuckDB mirror
    counts the same triangles).

    Returns ``(node, degree, triangles)`` for every node of the
    canonicalized graph (isolated-in-no-triangle nodes included with
    0). (An r12 experiment pinned e/deg/oriented with ``pin_small``;
    measured flat, 1.96 → 2.00 s on the 500-node kNN query — the
    consumers' shared exchanges are still reused here and the eager
    materialization jobs only add latency. Reverted.)"""
    e = canonical_edges(edges, src, dst)
    deg = node_degrees(e)
    er = (
        e.join(
            deg.select(
                F.col("node").alias("a"), F.col("degree").alias("__da")
            ),
            "a",
        )
        .join(
            deg.select(
                F.col("node").alias("b"), F.col("degree").alias("__db")
            ),
            "b",
        )
    )
    ra = F.struct(F.col("__da").alias("d"), F.col("a").alias("n"))
    rb = F.struct(F.col("__db").alias("d"), F.col("b").alias("n"))
    lo_first = ra < rb
    oriented = er.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(lo_first, rb).otherwise(ra).alias("__hi_rank"),
    )
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = x.join(
        y,
        (F.col("x.lo") == F.col("y.lo"))
        & (F.col("x.__hi_rank") < F.col("y.__hi_rank")),
    ).select(
        F.col("x.lo").alias("u"),
        F.col("x.hi").alias("v"),
        F.col("y.hi").alias("w"),
    )
    closing = oriented.select(
        F.col("lo").alias("v"), F.col("hi").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"], "inner")
    per_node = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(per_node, "node", "left_outer").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
    )


def clustering_coefficients(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Local clustering coefficient per node: 2T / (d(d-1)), 0.0 where
    degree < 2 — the per-node density score (1.0 = my neighborhood is
    a clique = a real duplicate cluster; ~0 = I'm a hub stitching
    unrelated docs — an LSH false-positive signature)."""
    t = triangle_counts(edges, src, dst)
    d = F.col("degree").cast("double")
    return t.withColumn(
        "clustering_coeff",
        F.when(
            F.col("degree") >= 2,
            2.0 * F.col("triangles") / (d * (d - 1.0)),
        ).otherwise(F.lit(0.0)),
    )
