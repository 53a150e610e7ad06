"""Deterministic-sampling invariants: content-addressed membership
(partition-independent), exact stratum sizes, monotone reweighting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascading_hive_spark.operators.sampling import (
    _MOD,
    _MULT,
    bucket_permille,
    hash_order,
    hash_sample,
    stratified_sample,
    weighted_mix,
)
from cascading_hive_spark.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_hash_sample_partition_independent(spark, docs):
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 100).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(13), "doc_id", 100)
        .select("doc_id")
        .collect()
    }
    assert a == b
    n = docs.count()
    # rate lands near 10% (multiplicative hash is uniform-ish)
    assert 0.05 * n <= len(a) <= 0.15 * n


def test_hash_sample_stable_under_append(spark, docs):
    """Old rows keep their verdict when the corpus grows."""
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_pick = {r.doc_id for r in hash_sample(docs, "doc_id", 100).collect()}
    half_pick = {r.doc_id for r in hash_sample(half, "doc_id", 100).collect()}
    assert half_pick == {i for i in full_pick if i % 2 == 0}


def test_stratified_sample_exact_k(spark, docs):
    out = stratified_sample(docs, "doc_id", ["lang"], k=20)
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    strata = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in strata.items():
        assert sizes[lang] == min(20, n)
    # deterministic under repartition
    a = {(r.doc_id, r.lang) for r in out.select("doc_id", "lang").collect()}
    b = {
        (r.doc_id, r.lang)
        for r in stratified_sample(docs.repartition(7), "doc_id", ["lang"], k=20)
        .select("doc_id", "lang")
        .collect()
    }
    assert a == b


def test_weighted_mix_monotone_reweighting(spark, docs):
    """Raising a source's weight only ADDS rows — earlier picks
    survive (the curation-rerun property)."""
    low = {r.doc_id for r in weighted_mix(docs, "doc_id", "source", {"src1": 100}).collect()}
    high = {r.doc_id for r in weighted_mix(docs, "doc_id", "source", {"src1": 500}).collect()}
    assert low <= high
    # weight 1000 keeps the whole source
    full = {r.doc_id for r in weighted_mix(docs, "doc_id", "source", {"src1": 1000}).collect()}
    src1 = {r.doc_id for r in docs.filter(F.col("source") == "src1").collect()}
    assert full == src1


# --- int64-wrap regression (VERDICT r4 "What's wrong" #3) ------------
# The naive (id * MULT) % m wraps for id > ~3.47e9 and Spark's % keeps
# the dividend's sign, so wrapped-negative buckets passed `< rate`
# unconditionally. These ids are exactly what xxhash64 surrogate keys
# look like, so the extremes of the int64 range must honor the rate.

_EXTREME_IDS = [
    0,
    1,
    999,
    3_470_000_000,  # just below the old wrap point
    3_500_000_000,  # just above it
    2**40 + 7,
    2**62 + 12345,
    2**63 - 1,  # int64 max
    -1,
    -999,
    -(2**40) - 7,
    -(2**63),  # int64 min
]


def _extreme_df(spark):
    return spark.createDataFrame([(i,) for i in _EXTREME_IDS], "id long")


def test_bucket_permille_matches_python_bigints(spark):
    """Spark's wrap-free bucket == Python arbitrary-precision truth
    (Python % is floored division, same as pmod) over the full range."""
    got = {
        r.id: r.b
        for r in _extreme_df(spark).select("id", bucket_permille(F.col("id")).alias("b")).collect()
    }
    for i in _EXTREME_IDS:
        assert got[i] == (i * _MULT) % 1000, i
        assert 0 <= got[i] < 1000, i


def test_hash_order_matches_python_bigints(spark):
    got = {
        r.id: r.h
        for r in _extreme_df(spark).select("id", hash_order(F.col("id")).alias("h")).collect()
    }
    for i in _EXTREME_IDS:
        assert got[i] == (i * _MULT) % _MOD, i
        assert 0 <= got[i] < _MOD, i


def test_hash_sample_honors_rate_for_extreme_ids(spark):
    df = _extreme_df(spark)
    assert hash_sample(df, "id", 0).count() == 0  # rate 0 keeps nothing
    assert hash_sample(df, "id", 1000).count() == len(_EXTREME_IDS)
    kept = {r.id for r in hash_sample(df, "id", 100).collect()}
    expected = {i for i in _EXTREME_IDS if (i * _MULT) % 1000 < 100}
    assert kept == expected


def test_weighted_mix_honors_rate_for_extreme_ids(spark):
    df = _extreme_df(spark).withColumn("source", F.lit("crawl"))
    assert weighted_mix(df, "id", "source", {"crawl": 0}).count() == 0
    kept = {r.id for r in weighted_mix(df, "id", "source", {"crawl": 50}).collect()}
    expected = {i for i in _EXTREME_IDS if (i * _MULT) % 1000 < 50}
    assert kept == expected
