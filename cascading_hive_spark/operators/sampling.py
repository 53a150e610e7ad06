"""Deterministic sampling operators for corpus curation (north-star
surface; the reference has no sampling — SURVEY.md §2.C).

Everything here is CONTENT-ADDRESSED: membership is a pure function of
row identity, never of partitioning, cluster size, or execution order —
re-running yesterday's sample on a re-partitioned copy of the corpus
yields byte-identical output (the property `df.sample()` cannot give).
The pseudo-random order is a Knuth multiplicative hash of the id,
engine-portable arithmetic (same trick as train_test_split's oracle),
so every operator has an exact DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative constant; modulus = large prime. The naive
# ``(id * MULT) % m`` overflows int64 for id > ~3.47e9 — exactly the
# full-range longs xxhash64 surrogate keys produce — and Spark's ``%``
# keeps the dividend's sign, so wrapped-negative values silently pass
# any ``< rate`` filter. All sites therefore reduce the id mod m FIRST
# (``(a*b) % m == ((a%m) * (b%m)) % m``) and use ``pmod`` so negative
# ids land in [0, m) too. Largest intermediate product:
# (1e9+6) * 2654435761 ≈ 2.65e18 < 2^63-1. DuckDB mirrors the same
# algebra (it raises OutOfRange instead of wrapping, so the naive form
# is also an engine divergence).
_MULT = 2654435761
_MOD = 1_000_000_007


def hash_order(id_col: Column) -> Column:
    """Deterministic pseudo-random sort key in [0, 1e9+7); wrap-free
    for the full int64 id range, negatives included."""
    return F.pmod(F.pmod(id_col, F.lit(_MOD)) * F.lit(_MULT), F.lit(_MOD))


def bucket_permille(id_col: Column) -> Column:
    """Deterministic bucket in [0, 1000); wrap-free for any int64 id.
    ``(id * MULT) % 1000 == ((id % 1000) * (MULT % 1000)) % 1000``."""
    return F.pmod(F.pmod(id_col, F.lit(1000)) * F.lit(_MULT % 1000), F.lit(1000))


def hash_sample(df: DataFrame, id_col: str, rate_permille: int) -> DataFrame:
    """Bernoulli-style sample keeping ``rate_permille``/1000 of rows,
    chosen by id hash — one narrow filter, no shuffle, stable under
    appends (old rows keep their verdict when new data arrives)."""
    return df.filter(bucket_permille(F.col(id_col)) < rate_permille)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_cols: list[str],
    k: int,
) -> DataFrame:
    """EXACTLY k rows per stratum (fewer if the stratum is smaller),
    deterministically: rank each stratum by the hash order and keep the
    first k. One shuffle on the strata key; the per-stratum sort is the
    cost — at 100 TB pre-filter with ``hash_sample`` at a few times the
    target rate first, then exact-rank the survivors, so the window
    sorts thousands of rows per stratum instead of millions."""
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        hash_order(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights_permille: dict[str, int],
    default_permille: int = 0,
) -> DataFrame:
    """Corpus mixing: per-source keep rates (permille), the curation
    step that rebalances a blend (e.g. keep 100% of books, 5% of crawl).
    Membership is the same id hash for every source, so raising one
    source's weight later only ADDS rows — previous picks stay picked
    (monotone reweighting, the property curation reruns need)."""
    bucket = bucket_permille(F.col(id_col))
    rate = None
    for src, permille in sorted(weights_permille.items()):
        cond = F.col(source_col) == src
        rate = F.when(cond, permille) if rate is None else rate.when(cond, permille)
    rate = F.lit(default_permille) if rate is None else rate.otherwise(default_permille)
    return df.filter(bucket < rate)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    bucket_chars: int = 2,
) -> DataFrame:
    """Reproducible global permutation of a corpus — the training-data
    "epoch shuffle". Adds ``global_pos`` (0..n-1, a contiguous dense
    permutation index) ordered by ``md5(seed || '|' || id)``; same
    seed → byte-identical order on any partitioning, any engine (md5
    hex sorts identically lexicographically and numerically).

    A naive global ``row_number() OVER (ORDER BY hash)`` funnels the
    whole corpus through ONE reducer. This uses the two-phase global
    index instead: the first ``bucket_chars`` hex chars of the hash
    range-bucket the rows (256 buckets at 2 chars — raise to 3-4 at
    100 TB for 4k-64k buckets), per-bucket ``row_number`` runs in
    parallel, and each bucket's starting offset is the prefix sum of
    the tiny per-bucket count table, broadcast back. Cost: one shuffle
    on the bucket key + a broadcast of <=16**bucket_chars longs.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    bucketed = df.withColumn("_h", h).withColumn(
        "_bucket", F.substring(F.col("_h"), 1, bucket_chars)
    )
    counts = bucketed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_cnt"))
    # prefix-sum window over <=16**bucket_chars rows — trivially small
    w_off = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "_bucket",
        (F.sum("_cnt").over(w_off) - F.col("_cnt")).alias("_offset"),
    )
    w_in = Window.partitionBy("_bucket").orderBy(F.col("_h"), F.col(id_col))
    return (
        bucketed.withColumn("_rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "_bucket")
        .withColumn("global_pos", (F.col("_offset") + F.col("_rn") - 1).cast("bigint"))
        .drop("_h", "_bucket", "_rn", "_offset")
    )


def bucket_ppm(id_col: Column) -> Column:
    """Deterministic bucket in [0, 1_000_000) — the parts-per-million
    refinement of ``bucket_permille`` for rates too fine for 1/1000
    granularity (temperature mixing computes fractional per-source
    rates). Same wrap-free Knuth-hash algebra, then reduced mod 1e6
    (``_MOD`` is not a multiple of 1e6, so the residue is only
    approximately uniform — off by ~1e-3 relative, irrelevant for
    sampling)."""
    return F.pmod(hash_order(id_col), F.lit(1_000_000))


def temperature_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    alpha: float = 0.3,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-scaled corpus mixing — the multilingual-LLM
    rebalance (mC4/XLM-R style): sample sources proportionally to
    ``share**alpha`` (renormalized) instead of their raw share, so
    alpha=1 keeps the natural mix, alpha=0 equalizes all sources, and
    the usual 0.2-0.7 up-weights the tail without drowning the head.

    ``budget`` is the target TOTAL row count (default: half the
    corpus); each source's keep-rate is ``min(1, budget * q_s / n_s)``
    with ``q_s = n_s**alpha / sum(n**alpha)`` — clamped sources (rate
    1.0) simply keep everything, the standard behavior when a tiny
    source's temperature-boosted quota exceeds its size.

    Membership is content-addressed (``bucket_ppm`` of the id against
    the source's rate in ppm), so re-runs, re-partitions, and appends
    keep prior picks. Cost at scale: one tiny per-source count
    aggregate, a broadcast join of the per-source rate table, one
    narrow filter — no window, no global sort. The ppm rate is
    round()ed so the engine-portable oracle thresholds on the same
    integer (doubles-rounded-on-both-sides house rule).

    Returns the sampled rows plus ``mix_rate_ppm`` for auditability.
    """
    from pyspark.sql import Window

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    # the global windows below run over the COUNTS table — one row per
    # source, bounded — not over the corpus
    w_global = Window.partitionBy()
    total_budget = (
        F.lit(float(budget))
        if budget is not None
        else F.sum("_n").over(w_global) / 2.0
    )
    w_all = F.sum(F.pow(F.col("_n").cast("double"), F.lit(alpha))).over(w_global)
    q = F.pow(F.col("_n").cast("double"), F.lit(alpha)) / w_all
    rate_ppm = F.least(
        F.lit(1_000_000).cast("bigint"),
        F.floor(F.lit(1_000_000.0) * total_budget * q / F.col("_n") + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    rates = counts.select(source_col, rate_ppm.alias("mix_rate_ppm"))
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(bucket_ppm(F.col(id_col)) < F.col("mix_rate_ppm"))
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    test_permille: int = 100,
    valid_permille: int = 0,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Train/valid/test split that near-duplicate clusters can never
    straddle — the contamination guard a naive per-document split
    lacks (a test document whose near-dup sits in train leaks the
    answer). Connected components over the supplied near-dup
    ``pairs`` (from any dedup family: MinHash bands, embedding LSH,
    n-gram Jaccard) give each document a ``cluster_key`` (min member
    id; singletons = their own id), and the split decision hashes the
    CLUSTER key, so every member of a component lands in the same
    split.

    Scale: the component computation runs only over documents that
    appear in a dup pair (≪ corpus for real dedup output); the
    cluster map joins back on the id key (broadcast when small, AQE
    otherwise); split assignment is one narrow hash filter. No
    window, no global sort.

    Returns ``df``'s columns plus ``cluster_key`` and ``split``.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    from cascading_hive_spark.operators.graph import dedup_clusters

    if test_permille + valid_permille > 1000:
        raise ValueError("test_permille + valid_permille must be <= 1000")
    # The cluster key is hashed as a bigint; a non-integral id column
    # would cast to NULL silently, every row of which falls through to
    # 'train' — a silent loss of the test split. Fail loudly instead
    # (ADVICE r12).
    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"leakage_safe_split needs an integral id column; {id_col!r} is "
            f"{id_type.simpleString()} (hash a surrogate bigint id first)"
        )
    clusters = dedup_clusters(pairs, id_a, id_b).withColumnRenamed("id", "_cc_id")
    # reference the clusters side's column explicitly: df may already
    # carry a cluster_id column of its own (ADVICE r12)
    keyed = df.join(
        clusters, df[id_col] == clusters["_cc_id"], "left"
    ).withColumn(
        "cluster_key",
        F.coalesce(clusters["cluster_id"], df[id_col]).cast("bigint"),
    ).drop(clusters["_cc_id"]).drop(clusters["cluster_id"])
    b = bucket_permille(F.col("cluster_key"))
    split = (
        F.when(b < test_permille, F.lit("test"))
        .when(b < test_permille + valid_permille, F.lit("valid"))
        .otherwise(F.lit("train"))
    )
    return keyed.withColumn("split", split)


def cap_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    cap: int,
    seed: int = 0,
    bucket_chars: int = 2,
) -> DataFrame:
    """Keep at most ``cap`` rows per key, chosen deterministically by
    md5 hash order of the id — the per-domain quota every crawl
    curation pipeline applies so no single host dominates the corpus
    (and the per-source / per-license quota, with a different key).
    Same rows survive on any partitioning, any engine, and under
    appends the already-kept rows keep their verdict only if still
    within the cap — the selection is a pure function of (key's ids,
    cap, seed).

    A naive ``row_number() OVER (PARTITION BY key ORDER BY hash)``
    funnels the hottest key through ONE task — exactly the skewed-
    domain case the cap exists for. Two-phase instead (the
    deterministic_shuffle / AUC-midrank prefix trick, made per-key):
    the first ``bucket_chars`` hex chars of the hash range-bucket each
    key's rows; the per-(key, bucket) count table (≤ 16^bucket_chars
    rows per key) takes a per-key prefix sum; buckets whose prefix
    already reaches the cap drop WITHOUT RANKING — so the ranking
    window's input per key is at most cap + one bucket (~n_key/256 at
    2 chars; raise bucket_chars at 100 TB so the hottest domain's
    boundary bucket stays task-sized). Under-cap keys pass through
    the same plan with every bucket surviving.

    If ``cap`` must instead be approximate-but-one-pass (no count
    table at all), filter on ``bucket_ppm(id) < cap * 1e6 / n_key``
    with a precomputed key-count broadcast — this exact version costs
    one extra bounded aggregation and is what the quota semantics
    usually require.
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    bucketed = df.withColumn("_h", h).withColumn(
        "_b", F.substring(F.col("_h"), 1, bucket_chars)
    )
    counts = bucketed.groupBy(key_col, "_b").agg(F.count(F.lit(1)).alias("_cnt"))
    w_pref = (
        Window.partitionBy(key_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = counts.select(
        key_col,
        "_b",
        (F.sum("_cnt").over(w_pref) - F.col("_cnt")).alias("_before"),
    )
    survivors = bucketed.join(before, [key_col, "_b"]).filter(
        F.col("_before") < cap
    )
    w_rank = Window.partitionBy(key_col).orderBy(F.col("_h"), F.col(id_col))
    return (
        survivors.withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") <= cap)
        .drop("_h", "_b", "_before", "_rn")
    )


def annealed_epoch_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    alphas: list[float],
    budget: int | None = None,
) -> DataFrame:
    """Multi-EPOCH curriculum mixing: epoch ``e`` draws a
    ``temperature_mix`` with temperature ``alphas[e]`` — the annealing
    schedule pretraining curricula run (start near the natural mix,
    anneal toward a flatter tail-up-weighted mix in later epochs, or
    the reverse). Output is one row per (kept document, epoch) with
    ``epoch`` and ``mix_rate_ppm`` attached — a document may appear in
    several epochs, which is exactly what an epoch schedule means.

    Membership stays content-addressed but is DECORRELATED across
    epochs by a per-epoch multiplier ``MULT^(e+1) mod M`` (exact
    Python modpow, carried as a column of the bounded epochs table —
    M is prime so every power is invertible and epoch e's ordering is
    epoch e-1's re-hashed once more; an ADDITIVE tweak like MULT+e
    measured ~0.99 Jaccard between epochs on small-id corpora because
    the product shifts by only e·id). Epoch 0 keeps multiplier MULT,
    so ``alphas=[a]`` reproduces ``temperature_mix(df, a)`` membership
    bit-for-bit.

    Scale shape: one per-source count aggregate, a bounded
    (sources x epochs) rate table broadcast onto the corpus, one
    narrow filter per joined row — no window over the corpus, no
    global sort; the corpus is scanned once (the epoch join fans each
    row to E thin candidates map-side before the filter).
    """
    from pyspark.sql import Window

    if not alphas:
        raise ValueError("alphas must be non-empty")
    for a in alphas:
        if not 0.0 <= a <= 1.0:
            raise ValueError(f"every alpha must be in [0, 1], got {a}")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    epochs = df.sparkSession.createDataFrame(
        [
            (e, float(a), pow(_MULT, e + 1, _MOD))
            for e, a in enumerate(alphas)
        ],
        "epoch int, _alpha double, _mult long",
    )
    ce = counts.crossJoin(F.broadcast(epochs))
    w_ep = Window.partitionBy("epoch")
    total_budget = (
        F.lit(float(budget))
        if budget is not None
        else F.sum("_n").over(w_ep) / 2.0
    )
    w_all = F.sum(F.pow(F.col("_n").cast("double"), F.col("_alpha"))).over(w_ep)
    q = F.pow(F.col("_n").cast("double"), F.col("_alpha")) / w_all
    rate_ppm = F.least(
        F.lit(1_000_000).cast("bigint"),
        F.floor(
            F.lit(1_000_000.0) * total_budget * q / F.col("_n") + F.lit(0.5)
        ).cast("bigint"),
    )
    rates = ce.select(
        source_col, "epoch", "_mult", rate_ppm.alias("mix_rate_ppm")
    )
    u = F.pmod(
        F.pmod(
            F.pmod(F.col(id_col), F.lit(_MOD)) * F.col("_mult"),
            F.lit(_MOD),
        ),
        F.lit(1_000_000),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(u < F.col("mix_rate_ppm"))
        .drop("_mult")
    )
