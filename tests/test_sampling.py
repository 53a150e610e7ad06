"""Deterministic-sampling invariants: content-addressed membership
(partition-independent), exact stratum sizes, monotone reweighting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascading_hive_spark.operators.sampling import (
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
