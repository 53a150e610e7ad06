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

# Knuth's multiplicative constant; modulus = large prime. Both fit in
# a 64-bit product for any realistic id, and every SQL engine computes
# them identically.
_MULT = 2654435761
_MOD = 1_000_000_007


def hash_order(id_col: Column) -> Column:
    """Deterministic pseudo-random sort key in [0, 1e9+7)."""
    return (id_col * _MULT) % _MOD


def hash_sample(df: DataFrame, id_col: str, rate_permille: int) -> DataFrame:
    """Bernoulli-style sample keeping ``rate_permille``/1000 of rows,
    chosen by id hash — one narrow filter, no shuffle, stable under
    appends (old rows keep their verdict when new data arrives)."""
    return df.filter((F.col(id_col) * _MULT) % 1000 < rate_permille)


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
    bucket = (F.col(id_col) * _MULT) % 1000
    rate = None
    for src, permille in sorted(weights_permille.items()):
        cond = F.col(source_col) == src
        rate = F.when(cond, permille) if rate is None else rate.when(cond, permille)
    rate = F.lit(default_permille) if rate is None else rate.otherwise(default_permille)
    return df.filter(bucket < rate)
