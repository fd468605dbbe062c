"""DSIR: Data Selection with Importance Resampling (Xie et al. 2023)
— resample a raw corpus toward a target distribution using hashed
n-gram language-model importance weights.

The standard large-scale pretraining-data curation move: you have a
small TARGET corpus (curated English, a domain, a benchmark's style)
and a huge RAW corpus; you want the raw subset that looks most like
the target. DSIR fits two bag-of-hashed-n-gram unigram LMs — one on
the target rows, one on the raw corpus — and weighs every raw document
by its log-likelihood ratio; sampling ∝ exp(weight) without
replacement is then the Gumbel-top-k trick (weight + Gumbel noise,
take the top n).

Spark-first shape (everything corpus-linear, tiny key domains):

* features (word unigrams + adjacent bigrams) are a row-local explode
  — no UDF, `zip_with` builds the bigrams;
* each feature hashes to one of ``buckets`` ids via the engine's
  md5-prefix idiom (sampling.py) — the SAME construction a DuckDB
  oracle can state, so the whole operator is value-checkable;
* bucket counts are ONE map-combinable groupBy on a ``buckets``-sized
  key domain; the totals inject as a 1-row broadcast scalar and the
  per-bucket log-ratio table (``buckets`` rows) broadcasts onto the
  feature stream; per-doc weights close with one groupBy on doc id;
* the Gumbel top-k is `TakeOrderedAndProject` — per-partition partial
  top-n, never a global sort.

Float determinism: the bucket ratios are single IEEE divisions of
integers (bit-identical across engines); ``ln`` may differ in the last
ulp between libm implementations, so summed weights agree to ~1e-13
and every surfaced weight/priority is ROUND()ed to 6 decimals on both
sides. Ranking uses the raw doubles (gaps at the top-n boundary are
orders of magnitude above ulp noise — the knn_graph discipline) with
the doc id as the stated tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from pyspark.sql import functions as F

from mysql_syncer_spark.pin import pin

from mysql_syncer_spark.operators.sampling import BUCKETS, hash_bucket


def _tokens(text_col: str) -> Column:
    """Whitespace tokens; NULL/blank text -> empty array (the corpus
    tokenization convention, lines.py / text.py)."""
    t = F.col(text_col)
    return F.when(
        t.isNull() | (F.trim(t) == ""), F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(t), r"\s+"))


def _features(text_col: str) -> Column:
    """Hashed-n-gram feature stream: unigrams + adjacent bigrams
    (space-joined) — the DSIR paper's feature space, built row-locally
    with ``zip_with`` (no UDF)."""
    toks = _tokens(text_col)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _bucket(col: Column, buckets: int, salt: str) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(buckets))


def dsir_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    buckets: int = 1024,
    salt: str = "dsir",
    weight_col: str = "dsir_weight",
) -> DataFrame:
    """Per-document importance weight: sum over the doc's hashed
    features of ``ln p_target(bucket) - ln p_raw(bucket)`` with +1 /
    +buckets add-one smoothing. ``target`` is a boolean Column naming
    the target rows (e.g. ``F.col("lang") == "en"``); the raw LM is the
    WHOLE corpus. Returns every input row's id with its (unrounded)
    weight — docs with no features weigh 0.0 (they carry no evidence
    either way)."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    from mysql_syncer_spark.operators.spread import spread_small

    # the explode + per-feature md5 is the expensive map stage — spread
    # a small corpus so it is not serialized on the scan's task count,
    # then REDUCE BEFORE REUSE: collapse the feature stream to one row
    # per (doc, bucket) with its occurrence count. Both LMs (the bucket
    # counts) and the per-doc weights derive from that small pinned
    # frame, so the feature stream is computed exactly once and nothing
    # corpus×features-sized is ever materialized or re-evaluated.
    # Weight float shape: sum(count × lw) per doc instead of lw added
    # once per occurrence — within the ~1e-13 cross-engine ln()
    # envelope the 6 dp surface rounding already absorbs (oracle-
    # verified at three SFs).
    feats = spread_small(docs).select(
        F.col(id_col),
        target.cast("int").alias("__is_target"),
        F.explode(_features(text_col)).alias("__f"),
    ).select(
        id_col,
        "__is_target",
        _bucket(F.col("__f"), buckets, salt).alias("__b"),
    )
    per_db = (
        feats.groupBy(id_col, "__b")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.first("__is_target").alias("__is_target"),
        )
        .transform(pin)
    )
    bc = per_db.groupBy("__b").agg(
        F.sum(F.col("__is_target") * F.col("__c")).cast("long").alias("__tc"),
        F.sum("__c").cast("long").alias("__rc"),
    )
    tot = bc.agg(
        F.coalesce(F.sum("__tc"), F.lit(0)).cast("long").alias("__T"),
        F.coalesce(F.sum("__rc"), F.lit(0)).cast("long").alias("__R"),
    )
    lw = bc.crossJoin(F.broadcast(tot)).select(
        "__b",
        (
            F.log((F.col("__tc") + F.lit(1.0)) / (F.col("__T") + F.lit(float(buckets))))
            - F.log((F.col("__rc") + F.lit(1.0)) / (F.col("__R") + F.lit(float(buckets))))
        ).alias("__lw"),
    )
    dw = (
        per_db.join(F.broadcast(lw), "__b")
        .groupBy(id_col)
        .agg(F.sum(F.col("__lw") * F.col("__c")).alias(weight_col))
    )
    return (
        docs.select(id_col)
        .join(dw, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce(F.col(weight_col), F.lit(0.0)).alias(weight_col),
        )
    )


def dsir_sample(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    n: int,
    buckets: int = 1024,
    salt: str = "dsir",
    gumbel_salt: str = "dsir-gumbel",
) -> DataFrame:
    """Importance RESAMPLING: draw ``n`` docs without replacement with
    probability ∝ exp(weight) via Gumbel-top-k — priority = weight +
    Gumbel(u) with u the deterministic md5 uniform of the doc id
    (re-salting draws an independent sample), Gumbel(u) =
    -ln(-ln(u)). Returns ``(id, dsir_weight, priority)`` for the
    selected docs; selection ranks the RAW priority with the id as
    tie-break, executed as a per-partition partial top-n."""
    if n < 1:
        raise ValueError(f"sample size must be >= 1, got {n}")
    w = dsir_weights(docs, id_col, text_col, target, buckets, salt)
    u = (hash_bucket(id_col, gumbel_salt) + F.lit(1.0)) / F.lit(
        BUCKETS + 1.0
    )
    return (
        w.withColumn("priority", F.col("dsir_weight") - F.log(-F.log(u)))
        .orderBy(F.col("priority").desc(), F.col(id_col))
        .limit(n)
    )
