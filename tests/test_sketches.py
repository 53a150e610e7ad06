"""Misra-Gries heavy hitters (operators/sketches.py).

Properties under test: (1) the two-pass result is EXACT — equal to
the brute-force groupBy+filter — regardless of how the input is
partitioned (the candidate superset varies, the answer must not);
(2) the summary structure itself respects its k-counter bound while
never evicting a key frequent enough to matter.
"""

import pytest

from pyspark.sql import functions as F

from cascading_hive_spark.operators.sketches import _mg_merge, heavy_hitters


def _skewed_df(spark):
    # 10_000 rows: key "hot" 30%, "warm" 20%, 500-key uniform tail 50%
    return spark.range(10_000).select(
        F.when(F.col("id") < 3000, F.lit("hot"))
        .when(F.col("id") < 5000, F.lit("warm"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 500).cast("string")))
        .alias("k")
    )


def _exact(df, phi):
    total = df.count()
    return {
        (r["k"], r["cnt"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > phi * total)
        .collect()
    }


@pytest.mark.parametrize("n_parts", [1, 7, 32])
def test_heavy_hitters_exact_across_partitionings(spark, n_parts):
    df = _skewed_df(spark).repartition(n_parts)
    got = {
        (r["k"], r["cnt"])
        for r in heavy_hitters(df, ["k"], phi=0.1).collect()
    }
    assert got == _exact(df, 0.1) == {("hot", 3000), ("warm", 2000)}


def test_heavy_hitters_composite_key_matches_exact(spark):
    df = _skewed_df(spark).withColumn("g", (F.length("k") % 2).cast("int"))
    phi = 0.05
    total = df.count()
    exact = {
        (r["k"], r["g"], r["cnt"])
        for r in df.groupBy("k", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > phi * total)
        .collect()
    }
    got = {
        (r["k"], r["g"], r["cnt"])
        for r in heavy_hitters(df, ["k", "g"], phi=phi).collect()
    }
    assert got == exact


def test_heavy_hitters_tight_k_still_exact(spark):
    # phi=0.45 -> k=3 counters; only "hot"+"warm" can survive eviction
    df = spark.range(1000).select(
        F.when(F.col("id") < 500, F.lit("hot"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 50).cast("string")))
        .alias("k")
    )
    got = {(r["k"], r["cnt"]) for r in heavy_hitters(df, ["k"], 0.45).collect()}
    assert got == {("hot", 500)}


def test_heavy_hitters_phi_validation(spark):
    df = _skewed_df(spark)
    with pytest.raises(ValueError):
        heavy_hitters(df, ["k"], 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, ["k"], 1.0)


def test_mg_merge_bounds_and_retention():
    k = 4
    counters: dict = {}
    # stream: "a" appears 60 times among 100 items -> must survive any
    # eviction schedule with k=4 (count > n/k = 25)
    stream = (["a"] * 3 + ["b", "c"]) * 20
    for i in range(0, len(stream), 10):
        batch: dict = {}
        for x in stream[i : i + 10]:
            batch[x] = batch.get(x, 0) + 1
        counters = _mg_merge(counters, batch, k)
        assert len(counters) <= k
    assert "a" in counters


def test_mg_merge_never_overcounts():
    counters = _mg_merge({}, {"a": 5, "b": 3, "c": 2, "d": 1}, k=2)
    # after cutting at the (k+1)-th largest, residual counts are
    # underestimates (MG invariant), never above the true count
    assert counters.get("a", 0) <= 5
    assert all(c > 0 for c in counters.values())
    assert len(counters) <= 2


def test_heavy_hitters_keeps_null_keys(spark):
    """NULL-keyed groups are first-class heavy hitters: pass 1 keeps
    them (dropna=False) and pass 2's recount join must be null-safe —
    a plain equality semi-join would silently drop them (ADVICE r8).
    Also exercises the NaN->None canonicalization: a null in a bigint
    key column must survive the Arrow round-trip of mapInPandas."""
    df = spark.range(1000).select(
        F.when(F.col("id") < 400, F.lit(None).cast("bigint"))
        .otherwise(F.col("id") % 200)
        .alias("k")
    ).repartition(7)
    got = {
        (r["k"], r["cnt"])
        for r in heavy_hitters(df, ["k"], phi=0.1).collect()
    }
    assert got == {(None, 400)}


def test_heavy_hitters_null_key_split_across_partitions(spark):
    """The null key must merge into ONE Misra-Gries counter per
    partition even when it arrives across many Arrow batches — NaN's
    self-inequality would otherwise split it and break the retention
    bound. Composite (bigint, string) keys with nulls on both sides."""
    df = spark.createDataFrame(
        [(None, None)] * 300
        + [(1, "x")] * 250
        + [(i, "t") for i in range(450)],
        "a bigint, b string",
    ).repartition(11)
    got = {
        (r["a"], r["b"], r["cnt"])
        for r in heavy_hitters(df, ["a", "b"], phi=0.2).collect()
    }
    assert got == {(None, None, 300), (1, "x", 250)}
