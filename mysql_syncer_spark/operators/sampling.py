"""Deterministic hash-based sampling and dataset splitting.

Training pipelines need samples and train/val/test splits that are
(a) reproducible across runs and engines, (b) stable under data
arrival order and partitioning, and (c) assigned row-locally with no
shuffle. ``df.sample()`` satisfies none of these (seeded per-partition
RNG — resplitting after a repartition reassigns rows). The standard
fix: hash a stable key into [0, 10000) and threshold.

The hash is the engine's md5-prefix trick (canon.py / dedup.py) so
every operator here has an exact DuckDB oracle:
``('0x' || substr(md5(salt || CAST(key AS VARCHAR)), 1, 15))::BIGINT
% 10000``. A ``salt`` decorrelates independent samples over the same
key population (sampling for eval ≠ sampling for dedup audit).

All expressions are built-in (md5/conv/pmod) — codegen'd, zero
shuffle: at 100 TB a 1% sample is one embarrassingly parallel scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: resolution of the sampling lattice: fractions quantize to 1/10000
BUCKETS = 10_000

_HEX_PREFIX = 15


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, BUCKETS) from md5(salt || key)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, _HEX_PREFIX),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(BUCKETS))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash: deterministic,
    order/partitioning-independent, and CONSISTENT — a key sampled at
    1% is also in the 10% sample (nested thresholds)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(hash_bucket(key_col, salt) < int(round(fraction * BUCKETS)))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by key hash: weights like
    ``{"train": 0.8, "val": 0.1, "test": 0.1}`` become contiguous
    bucket ranges. Total weight must be 1 (every row gets a split);
    assignment is per-key, so duplicate keys land in the same split —
    exactly what leakage-safe eval splits need."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(key_col, salt)
    expr = None
    edge = 0
    names = list(weights)
    for name in names[:-1]:
        edge += int(round(weights[name] * BUCKETS))
        cond = bucket < edge
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def cluster_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe split that keeps near-duplicate CLUSTERS intact.

    :func:`hash_split` already pins duplicate *keys* together, but two
    near-duplicate docs have different ids — hashed independently they
    can straddle train/test, leaking eval content into training. Here
    the split key is the row's cluster id when it is clustered
    (``clusters`` = output of cluster.duplicate_clusters), else its own
    id, so a doc and all its near-dups always land in the same split.

    At scale: the cluster map is a pairs-list projection, orders of
    magnitude smaller than the corpus — the left join broadcasts when
    dim-sized (AQE decides); the split itself stays a row-local
    codegen expression, exactly like hash_split.
    """
    cl = clusters.select(
        F.col("doc_id").alias(id_col), F.col("cluster_id").alias("__ckey")
    )
    keyed = df.join(cl, on=id_col, how="left").withColumn(
        "__skey", F.coalesce(F.col("__ckey"), F.col(id_col))
    )
    return hash_split(keyed, "__skey", weights, salt, split_col).drop(
        "__ckey", "__skey"
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weights: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Resample to a target domain MIXTURE: the output's per-group
    shares match ``weights`` (up to floor rounding) at the largest
    total the data allows. The bottleneck group (smallest
    ``count/weight``) is kept whole; every other group is downsampled
    by deterministic key-hash rank — the standard "data mixing" step
    before pretraining (e.g. web 60% / books 20% / code 20%).

    Groups absent from ``weights`` are dropped. Weights need not sum
    to 1 (only ratios matter). Per-group targets are
    ``floor(w_g * min_h(n_h / w_h))`` computed IN-PLAN: a tiny
    count agg → broadcast min → broadcast quota join, then the same
    one-window-shuffle rank-and-keep as :func:`quota_sample`. Nothing
    is collected to the driver; the mixture spec and the per-group
    quota table are both #groups rows.

    Cross-engine exact: count, IEEE divide, MIN, multiply, floor —
    every step bit-reproducible in DuckDB for the oracle.
    """
    from pyspark.sql import Window

    if not weights:
        raise ValueError("weights must be non-empty")
    for g, w in weights.items():
        if w <= 0:
            raise ValueError(f"weight for {g!r} must be > 0, got {w}")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(g, float(w)) for g, w in weights.items()],
        f"{group_col} string, __wt double",
    )
    counts = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("__n"))
        .join(F.broadcast(wdf), group_col)
    )
    scale = counts.agg(
        F.min(F.col("__n") / F.col("__wt")).alias("__t")
    )
    quotas = (
        counts.crossJoin(F.broadcast(scale))
        .select(
            group_col,
            F.floor(F.col("__wt") * F.col("__t")).cast("long").alias(
                "__quota"
            ),
        )
    )
    rank = Window.partitionBy(group_col).orderBy(
        hash_bucket(key_col, salt), F.col(key_col)
    )
    return (
        df.join(F.broadcast(quotas), group_col)
        .withColumn("__rn", F.row_number().over(rank))
        .where(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float,
    salt: str = "",
) -> DataFrame:
    """Temperature-scaled mixture resampling: output per-group shares
    proportional to ``n_g ** alpha`` — the standard multilingual /
    multi-domain rebalancing step (mBERT/XLM-R exponential smoothing,
    typically alpha in [0.2, 0.7]; UniMax is the capped cousin).
    ``alpha < 1`` upweights low-resource groups RELATIVE to their
    natural share; boundary laws: ``alpha=1`` is the identity (every
    row kept), ``alpha=0`` equalizes every group to the smallest
    group's size.

    Unlike :func:`mixture_sample`, the weights are DATA-DEPENDENT
    (n_g^alpha), so they are computed in-plan: one tiny count agg →
    ``pow`` → broadcast min-scale → broadcast quota join → the same
    single-window-shuffle rank-and-keep. Nothing is collected to the
    driver; the quota table is #groups rows. Like mixture_sample, the
    bottleneck group (largest n_g / n_g^alpha ratio deficit — for
    alpha <= 1 always the smallest group) is kept whole and every
    other group downsamples to match, the largest total the data
    allows. Deterministic: key-hash rank, salt-controlled.

    Cross-engine exact: count, IEEE pow/divide, MIN, multiply, floor —
    bit-reproducible in DuckDB for the oracle. A NULL ``group_col`` is
    one ordinary group (SQL GROUP BY semantics), not dropped — the
    quota join goes through a struct-wrapped key so NULLs match.
    """
    from pyspark.sql import Window

    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    # struct-wrapped group key: plain equi-joins never match NULL keys,
    # which would break the alpha=1 identity law for NULL-group rows;
    # struct equality treats NULL fields as equal, so the NULL group is
    # one ordinary group throughout (groupBy/window already do this)
    gdf = df.withColumn("__gk", F.struct(group_col))
    counts = gdf.groupBy("__gk").agg(F.count("*").alias("__n"))
    weighted = counts.select(
        "__gk",
        "__n",
        F.pow(F.col("__n").cast("double"), F.lit(float(alpha))).alias(
            "__wt"
        ),
    )
    scale = weighted.agg(
        F.min(F.col("__n") / F.col("__wt")).alias("__t")
    )
    quotas = weighted.crossJoin(F.broadcast(scale)).select(
        "__gk",
        F.floor(F.col("__wt") * F.col("__t")).cast("long").alias("__quota"),
    )
    rank = Window.partitionBy("__gk").orderBy(
        hash_bucket(key_col, salt), F.col(key_col)
    )
    return (
        gdf.join(F.broadcast(quotas), "__gk")
        .withColumn("__rn", F.row_number().over(rank))
        .where(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota", "__gk")
    )


def duckdb_hash_bucket_sql(key: str, salt: str = "") -> str:
    """DuckDB mirror of :func:`hash_bucket` for oracle SQL strings."""
    return (
        f"(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, "
        f"{_HEX_PREFIX}))::BIGINT % {BUCKETS} + {BUCKETS}) % {BUCKETS}"
    )


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: Column | str,
    n: int,
    salt: str = "",
    priority_col: str = "priority",
) -> DataFrame:
    """Weighted sample WITHOUT replacement of ``n`` rows: priority
    sampling (Duffield–Lund–Thorup). Each row gets priority
    ``w / u`` for a deterministic uniform ``u`` derived from the key
    hash; the top-``n`` priorities are the sample. Higher-weight rows
    (e.g. quality score, doc length) are proportionally likelier to
    survive, and re-salting draws an independent sample.

    Deterministic AND engine-exact: ``u = (bucket+1)/(BUCKETS+1)`` and
    ``w / u`` are single IEEE divisions (bit-identical across engines —
    no pow/log, which differ in the last ulp between libm
    implementations), so the DuckDB mirror selects the identical set.

    Scale shape: the priority is row-local (zero shuffle); the top-n is
    ``orderBy(...).limit(n)`` which Spark executes as
    ``TakeOrderedAndProject`` — per-partition partial top-n on the map
    side, only n rows per partition reach the driver-side merge. No
    global sort materializes.
    """
    if n < 1:
        raise ValueError(f"sample size must be >= 1, got {n}")
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col)
    u = (hash_bucket(key_col, salt) + F.lit(1.0)) / F.lit(BUCKETS + 1.0)
    pri = w.cast("double") / u
    return (
        df.withColumn(priority_col, pri)
        .orderBy(F.col(priority_col).desc(), F.col(key_col))
        .limit(n)
    )


def quota_sample(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Cap rows per group at ``n`` (domain capping: no source/domain may
    dominate the corpus). Deterministic: rows rank within their group by
    (key hash, key) — stable under input order and partitioning, and
    re-salting draws an independent quota. One window shuffle on the
    group key; per-group state is a running rank, so a skewed group
    costs one fat task, never driver memory.

    DuckDB mirror: ``QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY
    <bucket_sql>, key) <= n``.
    """
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"quota must be >= 1, got {n}")
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(key_col, salt), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int,
    num_shards: int = 8,
    salt: str = "",
    shard_col: str = "shard",
    pos_col: str = "epoch_pos",
) -> DataFrame:
    """Deterministic per-epoch training order: every epoch gets a fresh
    global reshuffle of the corpus, reproducible bit-for-bit across
    runs/engines/partitionings — what ``df.orderBy(rand(seed))`` cannot
    promise (per-partition RNG reassigns rows after a repartition).

    Each row gets a per-epoch order key ``md5(salt#epoch#key)``; rows
    are dealt into ``num_shards`` shards by that key (data-parallel
    trainer workers each read one shard) and numbered within their
    shard by (order key, key) — the md5 makes both the shard deal and
    the within-shard order change completely between epochs.

    Shape: one shuffle on the shard id + a per-shard sort window —
    parallel across shards, nothing global; at 100 TB pick num_shards
    ≈ trainer world size × files-per-worker.
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    from pyspark.sql import Window

    ekey = F.md5(
        F.concat_ws(
            "#", F.lit(salt), F.lit(str(int(epoch))),
            F.col(key_col).cast("string"),
        )
    )
    out = df.withColumn("__ekey", ekey).withColumn(
        shard_col,
        F.pmod(
            F.conv(F.substring("__ekey", 1, _HEX_PREFIX), 16, 10).cast("long"),
            F.lit(num_shards),
        ).cast("int"),
    )
    w = Window.partitionBy(shard_col).orderBy("__ekey", key_col)
    return out.withColumn(pos_col, F.row_number().over(w)).drop("__ekey")


def duckdb_epoch_shuffle_sql(
    key: str, epoch: int, num_shards: int = 8, salt: str = ""
) -> str:
    """DuckDB mirror of :func:`epoch_shuffle`'s (shard, pos) columns."""
    ekey = (
        f"md5(concat_ws('#', '{salt}', '{int(epoch)}', "
        f"CAST({key} AS VARCHAR)))"
    )
    shard = (
        f"CAST(('0x' || substr({ekey}, 1, {_HEX_PREFIX}))::BIGINT "
        f"% {num_shards} AS INT)"
    )
    return (
        f"{shard} AS shard, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY {shard} "
        f"ORDER BY {ekey}, {key}) AS INT) AS epoch_pos"
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum Bernoulli sampling with deterministic key-hash
    thresholds: stratum ``g`` keeps ~``fractions[g]`` of its rows
    (groups absent from the map keep ``default_fraction``). The
    language/domain rebalancing primitive: e.g. keep 10% of English,
    100% of low-resource languages.

    Same guarantees as `hash_sample`, per stratum: deterministic,
    order/partitioning-independent, and NESTED — a key kept at 5% is
    also kept at any higher fraction (thresholds on one shared hash),
    so shrinking a stratum's budget only removes rows. Zero shuffles:
    the predicate is pure codegen on (group, key hash).

    DuckDB mirror: ``<bucket_sql> < CASE group WHEN ... THEN t ... END``
    with thresholds ``int(round(fraction * BUCKETS))``.
    """
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(
            f"default_fraction must be in [0, 1], got {default_fraction}"
        )
    thr = F.lit(int(round(default_fraction * BUCKETS)))
    for g, f in sorted(fractions.items()):
        thr = F.when(
            F.col(group_col) == g, F.lit(int(round(f * BUCKETS)))
        ).otherwise(thr)
    return df.where(hash_bucket(key_col, salt) < thr)


def replicate_mixture(
    df: DataFrame,
    group_col: str,
    multipliers: dict[str, float],
    key_col: str,
    salt: str = "",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Epoch-multiplier resampling WITH replication — the upsampling
    complement of `mixture_sample` (which can only downsample): stratum
    ``g`` is repeated ``multipliers[g]`` times per epoch, e.g.
    {wikipedia: 3.0, books: 2.5, web: 0.8} in a pretraining mix. Each
    row materializes ``floor(m)`` copies plus one more with probability
    ``frac(m)`` (deterministic per-key hash Bernoulli — the fractional
    epoch takes a CONSISTENT subset, the same rows every run, nested
    with any smaller fraction). Groups absent from the map are dropped
    (multiplier 0).

    Spark shape: a CASE over broadcastable literals computes each row's
    copy count, ``explode(sequence(1, n))`` fans it out row-locally —
    zero shuffles, zero joins at any scale; output size IS the target
    size. ``copy_col`` (1-based) distinguishes replicas so a downstream
    epoch shuffle can spread them.

    DuckDB mirror: ``unnest(generate_series(1, n))`` over the same CASE
    + bucket threshold arithmetic.
    """
    for g, m in multipliers.items():
        if m < 0:
            raise ValueError(f"multiplier for {g!r} must be >= 0, got {m}")
    whole = F.lit(0)
    frac_thr = F.lit(0)
    for g, m in sorted(multipliers.items()):
        whole = F.when(F.col(group_col) == g, F.lit(int(m))).otherwise(whole)
        frac_thr = F.when(
            F.col(group_col) == g,
            F.lit(int(round((m - int(m)) * BUCKETS))),
        ).otherwise(frac_thr)
    n = whole + (hash_bucket(key_col, salt) < frac_thr).cast("int")
    return (
        df.withColumn("__n_copies", n)
        .where(F.col("__n_copies") > 0)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(1), F.col("__n_copies"))),
        )
        .drop("__n_copies")
    )


def _waterfill(
    counts: DataFrame, group_col: str, budget: float, cap: float
) -> DataFrame:
    """UniMax waterfilling, closed form (see :func:`unimax_sample`):
    ``counts`` is the #groups-sized frame (group_col, __n); returns
    (group_col, __n, __quota) with __quota > 0 only. Window work runs
    entirely on the groups-sized frame."""
    from pyspark.sql import Window

    c = F.lit(float(cap))
    B = F.lit(float(budget))
    order = Window.orderBy("__n", group_col)
    run = Window.orderBy("__n", group_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    allw = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = (
        counts.withColumn("__i", F.row_number().over(order))
        .withColumn("__s", F.sum("__n").over(run))
        .withColumn("__g", F.count(F.lit(1)).over(allw))
    )
    # group i (ascending) is CAPPED iff its cap fits under the equal
    # share at its turn, assuming all smaller groups capped:
    #   c*n_i*(G-i+1) <= B - c*S_{i-1}
    nn = F.col("__n").cast("double")
    cond = (c * nn * (F.col("__g") - F.col("__i") + 1)) <= (
        B - c * (F.col("__s") - F.col("__n")).cast("double")
    )
    staged = staged.withColumn("__capped", cond)
    staged = staged.withColumn(
        "__t", F.max(F.when(cond, F.col("__i")).otherwise(0)).over(allw)
    ).withColumn(
        "__st",
        F.coalesce(
            F.max(F.when(cond, F.col("__s"))).over(allw), F.lit(0)
        ),
    )
    share = (B - c * F.col("__st").cast("double")) / (
        F.col("__g") - F.col("__t")
    )
    return staged.select(
        group_col,
        "__n",
        F.floor(F.when(F.col("__capped"), c * nn).otherwise(share))
        .cast("long")
        .alias("__quota"),
    ).where(F.col("__quota") > 0)


def unimax_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    target_rows: int,
    max_epochs: float,
    salt: str = "",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """UniMax sampling (Chung et al. 2023): spend a total row budget
    as UNIFORMLY across groups as possible, subject to a per-group
    epoch cap — no group is repeated more than ``max_epochs`` times,
    and the budget freed by capped (low-resource) groups spreads
    equally over the rest. The fairness-first alternative to
    temperature sampling (E165): temperature still over-samples the
    head; UniMax equalizes exactly up to the caps.

    The paper's allocation loop (ascending by group size: give each
    group min(cap·n_g, remaining/groups_left)) has a closed form —
    once a group is uncapped, every later one is uncapped with the
    SAME share — so the whole thing is window functions over the
    #groups-sized count frame: prefix sums find the cap/share
    threshold, no driver loop, no collect. Quotas are hit EXACTLY:
    each row gets ``quota // n_g`` copies and the ``quota % n_g``
    remainder goes to the lowest deterministic hash ranks (same
    hash-priority discipline as every sampler here — reproducible,
    and a bigger budget extends a smaller one's selection per group).

    Output: input columns + ``copy_col`` (1-based replica index).
    Shape: one tiny count agg + windows on it, one broadcast quota
    join, ONE per-group window shuffle for the remainder rank, one
    row-local explode. Groups with quota 0 drop out. A NULL
    ``group_col`` is one ordinary group (struct-wrapped quota join).
    """
    from pyspark.sql import Window

    if target_rows < 0:
        raise ValueError(f"target_rows must be >= 0, got {target_rows}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    # struct-wrapped group key: NULL-group rows must receive a quota
    # like any other group (plain equi-joins drop them; see
    # temperature_mixture)
    gdf = df.withColumn("__gk", F.struct(group_col))
    counts = gdf.groupBy("__gk").agg(F.count("*").alias("__n"))
    quotas = _waterfill(counts, "__gk", target_rows, max_epochs)
    rank = Window.partitionBy("__gk").orderBy(
        hash_bucket(key_col, salt), F.col(key_col)
    )
    joined = gdf.join(F.broadcast(quotas), "__gk").withColumn(
        "__rn", F.row_number().over(rank)
    )
    copies = (F.col("__quota") / F.col("__n")).cast("long") + (
        F.col("__rn") <= (F.col("__quota") % F.col("__n"))
    ).cast("long")
    return (
        joined.withColumn("__copies", copies)
        .where(F.col("__copies") > 0)
        .withColumn(
            copy_col, F.explode(F.sequence(F.lit(1), F.col("__copies")))
        )
        .drop("__n", "__quota", "__rn", "__copies", "__gk")
    )


def token_budget_cut(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    salt: str = "",
    bucket_hex: int = 3,
) -> DataFrame:
    """Select the maximal PREFIX of the deterministic hash-priority
    order whose token sum fits ``budget`` — "give me exactly ~N
    training tokens, reproducibly": rows are ordered by
    md5(salt || id) (unbiased, stable under reruns/partitioning, and
    CONSISTENT: a bigger budget strictly extends a smaller one's
    selection), and the cut keeps every row whose inclusive running
    token total is <= budget.

    The naive plan is a single global cumulative-sum window — one
    partition holding the whole corpus, the classic scale-killer. This
    is the two-level refinement instead: the priority's leading
    ``bucket_hex`` hex digits define 16^bucket_hex ORDER-PRESERVING
    buckets (hex-prefix comparison == priority comparison), so

    1. one combinable groupBy builds the buckets-sized token
       histogram, and a window over that TINY frame yields each
       bucket's exclusive prefix sum;
    2. buckets whose inclusive total fits keep ALL their rows (a
       broadcast histogram join — no per-row window at all);
    3. only the single BOUNDARY bucket (exclusive prefix <= budget <
       inclusive total) runs a per-row cumulative window, over
       corpus/16^bucket_hex rows, ordered by (priority, id) for a
       total deterministic order.

    Work: one shuffle for the histogram + one window over one
    bucket — the cut is exact (row-for-row equal to the global
    take-while) at any corpus size. Rows with NULL tokens are
    excluded (no token cost ⇒ no budget claim either way — document
    upstream if they should count as 0). NEGATIVE token counts raise
    at execution time: the bucket-prune/take-while equivalence needs
    monotone running totals, and a negative value would let a "full"
    bucket keep rows the global cut drops — fail loudly rather than
    return a silently-inexact selection."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if not 1 <= bucket_hex <= 8:
        raise ValueError(f"bucket_hex must be in [1, 8], got {bucket_hex}")
    from pyspark.sql import Window

    pr = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    nonneg = F.when(F.col(tokens_col) >= 0, F.lit(True)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"token_budget_cut: negative {tokens_col!r} value "
                ),
                F.col(tokens_col).cast("string"),
                F.lit(" breaks the monotone-prefix contract"),
            )
        ).cast("boolean")
    )
    rows = df.where(F.col(tokens_col).isNotNull()).where(nonneg).withColumn(
        "__pr", pr
    ).withColumn("__b", F.substring(F.col("__pr"), 1, bucket_hex))
    hist = rows.groupBy("__b").agg(
        F.sum(tokens_col).cast("long").alias("__bsum")
    )
    hw = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("__cum", F.sum("__bsum").over(hw)).withColumn(
        "__prev", F.col("__cum") - F.col("__bsum")
    )
    j = rows.join(F.broadcast(cum), "__b")
    full = j.where(F.col("__cum") <= budget)
    boundary = j.where(
        (F.col("__prev") <= budget) & (F.col("__cum") > budget)
    )
    bw = Window.partitionBy("__b").orderBy("__pr", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    boundary_kept = boundary.withColumn(
        "__rcum", F.sum(tokens_col).over(bw)
    ).where(F.col("__prev") + F.col("__rcum") <= budget).drop("__rcum")
    out_cols = df.columns
    return full.select(*out_cols).unionByName(
        boundary_kept.select(*out_cols)
    )


def unimax_tokens(
    df: DataFrame,
    group_col: str,
    key_col: str,
    tokens_col: str,
    token_budget: int,
    max_epochs: float,
    salt: str = "",
    bucket_hex: int = 3,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """UniMax over TOKEN budgets — the form the paper actually runs
    (budgets and caps are token counts, not row counts): spend
    ``token_budget`` tokens as uniformly across groups as the
    ``max_epochs`` cap allows, allocating by each group's TOKEN total.

    Allocation: the same closed-form waterfilling as
    :func:`unimax_sample` (:func:`_waterfill`), on per-group token
    sums. Delivery per group with quota q and total T:

    * ``floor(q / T)`` FULL epochs — every row replicated, exact;
    * the remaining ``q mod T`` tokens as one more partial epoch: the
      maximal prefix of the group's deterministic hash-priority order
      whose token sum fits — the E158 take-while, per group, via the
      same two-level refinement (per-(group, hex-bucket) histogram →
      windows over the groups×buckets frame → full buckets keep all
      rows via broadcast join → ONLY each group's boundary bucket
      runs a per-row cumulative window). No global or whole-group
      window at any scale.

    Output: input columns + ``copy_col`` (1-based; the partial epoch
    is the last index). Rows with NULL tokens are excluded; negative
    token counts raise at execution (they break the monotone-prefix
    equivalence — the E158 contract). Delivered tokens per group
    never exceed the group's quota; a bigger budget extends a smaller
    one's selection (nested, per group). A NULL ``group_col`` is one
    ordinary group (struct-wrapped joins).
    """
    from pyspark.sql import Window

    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    if not 1 <= bucket_hex <= 8:
        raise ValueError(f"bucket_hex must be in [1, 8], got {bucket_hex}")
    nonneg = F.when(
        F.col(tokens_col) < 0,
        F.raise_error(
            F.concat(
                F.lit(f"unimax_tokens: negative {tokens_col}: "),
                F.col(tokens_col).cast("string"),
            )
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    rows = df.where(F.col(tokens_col).isNotNull()).where(nonneg)
    # struct-wrapped group key (NULL-group rows keep their allocation;
    # see temperature_mixture)
    rows = rows.withColumn("__gk", F.struct(group_col))
    totals = rows.groupBy("__gk").agg(
        F.sum(tokens_col).cast("long").alias("__n")
    ).where(F.col("__n") > 0)
    quotas = _waterfill(totals, "__gk", token_budget, max_epochs)
    q2 = quotas.select(
        "__gk",
        "__n",
        (F.col("__quota") / F.col("__n")).cast("long").alias("__e"),
        (F.col("__quota") % F.col("__n")).alias("__rem"),
    )
    joined = rows.join(F.broadcast(q2), "__gk")
    out_cols = df.columns
    full_replicas = (
        joined.where(F.col("__e") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("__e"))))
        .select(*out_cols, copy_col)
    )
    # partial epoch: per-group two-level token take-while at __rem
    pr = F.md5(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    )
    cand = joined.where(F.col("__rem") > 0).withColumn(
        "__pr", pr
    ).withColumn("__b", F.substring(F.col("__pr"), 1, bucket_hex))
    hist = cand.groupBy("__gk", "__b").agg(
        F.sum(tokens_col).cast("long").alias("__bsum"),
        F.first("__rem").alias("__grem"),
    )
    hw = Window.partitionBy("__gk").orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("__cum", F.sum("__bsum").over(hw)).withColumn(
        "__prev", F.col("__cum") - F.col("__bsum")
    )
    j = cand.join(
        F.broadcast(cum.select("__gk", "__b", "__cum", "__prev")),
        ["__gk", "__b"],
    )
    full_buckets = j.where(F.col("__cum") <= F.col("__rem"))
    boundary = j.where(
        (F.col("__prev") <= F.col("__rem"))
        & (F.col("__cum") > F.col("__rem"))
    )
    bw = Window.partitionBy("__gk", "__b").orderBy(
        "__pr", key_col
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    boundary_kept = boundary.withColumn(
        "__rcum", F.sum(tokens_col).over(bw)
    ).where(F.col("__prev") + F.col("__rcum") <= F.col("__rem"))
    partial = (
        full_buckets.select(*out_cols, (F.col("__e") + 1).alias(copy_col))
        .unionByName(
            boundary_kept.select(
                *out_cols, (F.col("__e") + 1).alias(copy_col)
            )
        )
    )
    return full_replicas.unionByName(partial)


def weighted_reservoir_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """E178: deterministic weighted sampling without replacement —
    the Efraimidis–Spirakis A-ES scheme (Inf. Process. Lett. 2006):
    every row draws a uniform u from its key hash and gets the rank
    key ``u ** (1/w)``; the k LARGEST rank keys are exactly a weighted
    sample without replacement (each row's inclusion probability
    proportional to its weight, marginally). The standard way to cut a
    weighted corpus subsample (docs weighted by length/quality) in ONE
    scan with no RNG state and no global sort.

    Determinism: u = (md5 52-bit prefix + 0.5) / 2**52 — strictly
    inside (0, 1), so log(u) is finite and the DuckDB oracle reproduces
    the ranks bit-for-bit. 52 bits (13 hex chars) is the full integer
    precision of a double: ~4.5e15 distinct u values, so rank-key
    collisions at the cutoff are vanishing even at corpus scale (the
    r11 10_000-bucket grain systematically favored low keys inside the
    cutoff tie class — ADVICE r11). Rows with NULL or non-positive
    weight are excluded (their rank key is undefined — the A-ES domain
    is w > 0).

    Scale shape: the rank key is row-local codegen; the top-k is
    ``ORDER BY ... LIMIT k`` which Spark executes as
    TakeOrderedAndProject — per-partition size-k heaps + a k-sized
    driver merge, NEVER a global sort shuffle. 100 TB cost = one scan.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("double")
    u = _fine_uniform(key_col, salt)
    # rank = u ** (1/w); compare via ln(rank) = ln(u)/w (monotone, and
    # avoids pow underflow for tiny u / huge w)
    rank = F.log(u) / w
    # rank on the ROUNDED key (12 dp, key tie-break): ln() is not
    # required to be correctly rounded, so engines can differ by ~1 ulp
    # (abs error ~|rank|*2e-16, orders below the 5e-13 half-grid for
    # any w >= 0.01) — rounding before the cutoff makes the top-k
    # selection itself engine-stable, not just the displayed values
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("rank_key", F.round(rank, 12))
        .orderBy(F.desc("rank_key"), F.asc(key_col))
        .limit(k)
    )


#: A-ES uniform grain: 13 md5 hex chars = 52 bits — exactly a double's
#: integer precision, so (v + 0.5) / 2**52 is exact in both engines.
_FINE_HEX = 13
_FINE_MOD = float(1 << 52)


def _fine_uniform(key_col: str, salt: str = "") -> Column:
    """Deterministic uniform in (0, 1) at 52-bit grain from the key's
    md5 — the A-ES rank-key source (finer than the 10_000-bucket
    :func:`hash_bucket` grain, whose tie classes biased the cutoff at
    scale; ADVICE r11)."""
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
            1,
            _FINE_HEX,
        ),
        16,
        10,
    ).cast("double")
    return (v + F.lit(0.5)) / F.lit(_FINE_MOD)


def duckdb_weighted_reservoir_sql(
    key_col: str, weight_col: str, k: int, salt: str = ""
) -> str:
    """The DuckDB mirror of :func:`weighted_reservoir_sample`'s rank
    expression — ln(u)/w with the same md5-bucket u."""
    u = (
        f"((('0x' || substr(md5('{salt}' || CAST({key_col} AS VARCHAR)),"
        f" 1, {_FINE_HEX}))::BIGINT + 0.5) / {int(_FINE_MOD)}.0)"
    )
    return (
        f"ln({u}) / CAST({weight_col} AS DOUBLE)"
    )


def weighted_reservoir_sample_grouped(
    df: DataFrame,
    group_cols: "list[str]",
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """E181: per-group weighted sampling without replacement — the
    stratified form of :func:`weighted_reservoir_sample` (k docs per
    language/source, each drawn proportional to weight within its
    stratum; the shape quota-based corpus mixes actually need). Same
    deterministic A-ES rank key (52-bit uniform grain, shared with the
    global form — so the stratified draw IS the global draw filtered to
    the stratum, the consistency law the E184 registry key certifies),
    rounded before ranking (engine-stable cutoffs); the top-k runs as a
    group-partitioned rank window — one shuffle on the group key,
    reducers bounded by k rows per group, no global funnel (each
    group's rank is independent; with many groups this parallelizes
    across the cluster)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    w = F.col(weight_col).cast("double")
    u = _fine_uniform(key_col, salt)
    ranked = (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("rank_key", F.round(F.log(u) / w, 12))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*group_cols).orderBy(
                    F.desc("rank_key"), F.asc(key_col)
                )
            ),
        )
    )
    return ranked.where(F.col("__rn") <= k).drop("__rn")


def stratified_kfold(
    df: DataFrame,
    strata_cols: "list[str]",
    id_col: str,
    k: int = 5,
    salt: str = "",
) -> DataFrame:
    """E193: stratified k-fold assignment with a per-stratum balance
    GUARANTEE — the eval-split hash_split can't give you: a plain
    hash split balances folds only in expectation, so a small stratum
    (a rare language) can land 8/2 across folds and poison per-slice
    eval numbers. Here every stratum's rows are ranked by a
    deterministic md5 shuffle key (salted; same key = same fold next
    run) and dealt round-robin ``(rank − 1) mod k``, so within EVERY
    stratum the fold sizes differ by AT MOST ONE row — by
    construction, not in expectation.

    Adds ``fold`` (0..k−1). Scale shape: one rank window per stratum
    (the stratified-sampling exchange) — no joins, no driver state.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(salt))
    )
    w = Window.partitionBy(*strata_cols).orderBy(key, F.col(id_col))
    return df.withColumn(
        "fold",
        ((F.row_number().over(w) - 1) % k).cast("int"),
    )
