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
