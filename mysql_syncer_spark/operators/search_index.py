"""Persisted inverted index: exact term search over a document corpus
without scanning it.

The retrieval-side primitive next to the MinHash dedup index
(operators/minhash_index.py): posting lists ``(term, doc_id)`` built
ONCE from the corpus and persisted as a catalog table BUCKETED BY THE
TERM — a term lookup then reads only the term's bucket(s)
(``SelectedBucketsCount`` in the scan, gated in tests), never the
corpus and never the other buckets. AND-of-terms is the classic
posting-list intersection: filter the wanted terms, group by doc,
``HAVING count = n_terms`` — work proportional to the MATCHED posting
lists, independent of corpus size.

Same session-survival discipline as the MinHash index: the catalog
entry dies with the session but the files don't; ``_drop_stale`` +
re-register handles both directions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.minhash_index import (
    _drop_stale,
    _reattach_table,
)
from mysql_syncer_spark.operators.text import normalized_text, ws_tokens
from mysql_syncer_spark.sources.bucketed import write_bucketed


@dataclass(frozen=True)
class SearchIndex:
    name: str
    id_col: str
    postings: DataFrame
    #: term-frequency postings (term, id, tf, doc_len), bucketed by
    #: term — the persisted serving table for BM25 (None on indexes
    #: written before it existed; rebuild to add it)
    postings_tf: DataFrame | None = None


def search_index_write(
    corpus: DataFrame,
    name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> SearchIndex:
    """Build + persist the index tables, both bucketed (and sorted) by
    term: distinct ``(term, id)`` postings for boolean search, and
    ``(term, id, tf, doc_len)`` term-frequency postings so BM25 can be
    served from the index too (tf is NOT reconstructible from distinct
    postings). One tokenize pass feeds both writes."""
    spark = corpus.sparkSession
    _drop_stale(spark, f"{name}_postings")
    _drop_stale(spark, f"{name}_postings_tf")
    _drop_stale(spark, f"{name}_srchmeta")
    tf = postings_tf_frame(corpus, id_col, text_col)
    write_bucketed(
        tf.select("term", id_col),
        f"{name}_postings",
        ["term"],
        num_buckets,
        sort_cols=["term", id_col],
    )
    write_bucketed(
        tf,
        f"{name}_postings_tf",
        ["term"],
        num_buckets,
        sort_cols=["term", id_col],
    )
    # id_col/num_buckets persisted so a fresh session can re-register
    # the tables WITH their bucket spec (a plain re-register would
    # silently lose bucket pruning)
    spark.createDataFrame(
        [(id_col, num_buckets)], "id_col string, num_buckets int"
    ).write.mode("overwrite").saveAsTable(f"{name}_srchmeta")
    return search_index_read(spark, name, id_col)


def search_index_read(
    spark: SparkSession, name: str, id_col: str = "doc_id"
) -> SearchIndex:
    """Attach an index by name (re-registering the files in a fresh
    session if the in-memory catalog lost them — bucket spec restored
    from the persisted meta)."""
    cluster = ""
    if _reattach_table(spark, f"{name}_srchmeta"):
        meta = spark.table(f"{name}_srchmeta").first()
        id_col = meta["id_col"]
        cluster = (
            f"CLUSTERED BY (term) SORTED BY (term, `{id_col}`) "
            f"INTO {meta['num_buckets']} BUCKETS"
        )
    if not _reattach_table(spark, f"{name}_postings", cluster):
        raise ValueError(f"no search index named {name!r}")
    tf = (
        spark.table(f"{name}_postings_tf")
        if _reattach_table(spark, f"{name}_postings_tf", cluster)
        else None
    )
    return SearchIndex(name, id_col, spark.table(f"{name}_postings"), tf)


def search(
    index: SearchIndex, terms: list[str], mode: str = "all"
) -> DataFrame:
    """Doc ids matching the terms: ``mode='all'`` intersects posting
    lists (every term present), ``'any'`` unions them. The IN filter on
    the bucket column prunes unread buckets at planning time."""
    if not terms:
        raise ValueError("terms must be non-empty")
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be all/any, got {mode!r}")
    norm = sorted({t.strip().lower() for t in terms if t.strip()})
    hits = index.postings.where(F.col("term").isin(norm))
    if mode == "any":
        return hits.select(index.id_col).distinct()
    return (
        hits.groupBy(index.id_col)
        .agg(F.count_distinct("term").alias("__n"))
        .where(F.col("__n") == len(norm))
        .select(index.id_col)
    )


def postings_tf_frame(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Term-frequency postings ``(term, id, tf)`` + per-doc length
    carried on every row (denormalized so scoring needs no second
    join): one combinable (id, term) shuffle."""
    # (r12 negative result: spread_small on the projected scan measured
    # 0.96 -> 1.62 s isolated on bm25_search_docs — the text-payload
    # round-robin shuffle + keyless-repartition sort cost more than the
    # single-task tokenize; the (id, term) postings shuffle dominates.
    # Reverted.)
    toks = df.select(
        F.col(id_col),
        F.explode(ws_tokens(normalized_text(text_col))).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("doc_len"))
    return tf.join(dl, on=id_col)


def bm25_search(
    corpus_or_postings: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    postings: bool = False,
) -> DataFrame:
    """Top-``k`` docs by BM25 for a bag of query terms —
    ``(id, score)`` with the id as deterministic tie-break.

    Okapi BM25: ``score(d) = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1-b+b·len/avglen))`` with the standard smoothed
    ``idf = ln((N-df+0.5)/(df+0.5) + 1)``. N/avglen come from ONE
    1-row agg crossJoined broadcast; per-term df from the (tiny)
    matched postings; top-k is TakeOrderedAndProject. Pass a
    :func:`postings_tf_frame` — or a persisted ``*_postings_tf``
    index table, via :func:`bm25_search_indexed` — with
    ``postings=True`` to skip re-tokenizing; the distinct
    ``*_postings`` table does NOT qualify (tf is not reconstructible
    from it). Scores round to 6 dp for engine-exact ranking."""
    if not terms:
        raise ValueError("terms must be non-empty")
    norm = sorted({t.strip().lower() for t in terms if t.strip()})
    p = (
        corpus_or_postings
        if postings
        else postings_tf_frame(corpus_or_postings, id_col, text_col)
    )
    stats = p.groupBy(id_col).agg(F.first("doc_len").alias("__dl")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    hits = p.where(F.col("term").isin(norm))
    df_t = hits.groupBy("term").agg(
        F.count_distinct(id_col).alias("__df")
    )
    scored = (
        hits.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                (F.col("__n") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1
                * (1 - b + b * F.col("doc_len") / F.col("__avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("__s"), 6).alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def bm25_search_indexed(
    index: SearchIndex,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 served from the PERSISTED tf postings table: the term
    filter prunes to the query terms' buckets, the corpus is never
    touched. Rank-identical to :func:`bm25_search` over the corpus the
    index was built from."""
    if index.postings_tf is None:
        raise ValueError(
            f"index {index.name!r} has no tf postings table (written "
            "before BM25 serving existed) — rebuild with "
            "search_index_write to add it"
        )
    return bm25_search(
        index.postings_tf, terms, k=k, id_col=index.id_col,
        k1=k1, b=b, postings=True,
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase occurrences: ``(id, n_occurrences)`` for docs whose
    token stream contains the phrase's words CONSECUTIVELY — the
    positional-postings query bag-of-words search can't answer.

    Anchor trick (one combinable shuffle, no n-way self-join): token i
    of the phrase at document position p belongs to an occurrence
    anchored at ``p - i``; a (doc, anchor) cell holding ALL n distinct
    phrase slots is a match. Positions come from one ``posexplode``;
    matching cells from one groupBy HAVING — work proportional to the
    phrase words' postings, not the corpus. Repeated words in the
    phrase are handled by counting distinct SLOTS (not terms)."""
    # normalize the phrase driver-side with the same rules as the corpus
    norm = " ".join(phrase.strip().lower().split())
    words = norm.split(" ") if norm else []
    if len(words) < 2:
        raise ValueError("phrase must have at least two words")
    # (r12 negative result: spread_small on the projected scan measured
    # 0.61 -> 0.76 s isolated — same text-payload-shuffle reason as
    # postings_tf_frame. Reverted.)
    toks = df.select(
        F.col(id_col),
        F.posexplode(ws_tokens(normalized_text(text_col))).alias(
            "__pos", "__term"
        ),
    )
    slots = None
    for i, w in enumerate(words):
        s = toks.where(F.col("__term") == w).select(
            id_col,
            (F.col("__pos") - i).alias("__anchor"),
            F.lit(i).alias("__slot"),
        )
        slots = s if slots is None else slots.unionByName(s)
    return (
        slots.where(F.col("__anchor") >= 0)
        .groupBy(id_col, "__anchor")
        .agg(F.count_distinct("__slot").alias("__k"))
        .where(F.col("__k") == len(words))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion (RRF) of heterogeneous
# rankers — the standard way to combine lexical (BM25) and dense
# (embedding-cosine) retrieval without score calibration (BM25 scores
# and cosines live on incomparable scales; ranks don't):
#   rrf(d) = Σ_lists 1 / (k0 + rank_list(d)),  absent-from-list adds 0
# (Cormack/Clarke/Buettcher 2009). Work is k-sized end to end: each
# input is already a top-n ranking, rank assignment is one row_number
# window over <= n rows, fusion is a chain of k-sized outer joins —
# the corpus is never rescanned by the fusion step.
# ---------------------------------------------------------------------------


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k0: int = 60,
    score_col: str = "score",
) -> DataFrame:
    """Fuse >= 2 top-n rankings (``(id, score)`` frames) by reciprocal
    rank. Rank within each list is dense position by
    (score desc, id asc) — the deterministic tie-break every ranker in
    this package already emits. Returns one row per id seen in ANY
    list: ``(id, rank_0..rank_{n-1}, rrf_score)`` with NULL rank for
    lists that missed the id (contributing 0 to the sum, computed in
    fixed list order so the float fold is engine-reproducible)."""
    if len(rankings) < 2:
        raise ValueError(
            f"need >= 2 rankings to fuse, got {len(rankings)}"
        )
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    from pyspark.sql import Window

    ranked = []
    for i, r in enumerate(rankings):
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        ranked.append(
            r.select(
                F.col(id_col),
                F.row_number().over(w).cast("long").alias(f"rank_{i}"),
            )
        )
    out = ranked[0]
    for r in ranked[1:]:
        out = out.join(r, id_col, "full_outer")
    rrf = F.lit(0.0)
    for i in range(len(rankings)):
        rrf = rrf + F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"rank_{i}")),
            F.lit(0.0),
        )
    return out.withColumn("rrf_score", rrf)


def hybrid_search_rrf(
    docs: DataFrame,
    emb: DataFrame,
    terms: list[str],
    query_vec,
    k: int = 10,
    n_each: int = 20,
    k0: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid search over a corpus with parallel lexical and dense
    representations (doc_id ≡ vec_id): BM25 top-``n_each`` for the
    term bag + exact-cosine top-``n_each`` for the query vector, fused
    by RRF, final top-``k``. Returns ``(doc_id, rrf_score, bm25_rank,
    dense_rank)`` ordered (rrf desc, id asc). At 100 TB each leg runs
    its own scale path (persisted postings index / LSH-bucketed ANN);
    the fusion cost stays k-sized regardless."""
    from mysql_syncer_spark.operators.similarity import cosine_topk

    lex = bm25_search(docs, terms, k=n_each, id_col=id_col,
                      text_col=text_col)
    den = cosine_topk(
        emb, query_vec, k=n_each, id_col=vec_id_col, vec_col=vec_col
    ).withColumnRenamed(vec_id_col, id_col)
    fused = rrf_fuse([lex, den], id_col=id_col, k0=k0)
    return (
        fused.orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
        .select(
            id_col,
            F.round("rrf_score", 6).alias("rrf_score"),
            F.col("rank_0").alias("bm25_rank"),
            F.col("rank_1").alias("dense_rank"),
        )
    )
