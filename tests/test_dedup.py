"""Dedup operator semantics: LSH candidate generation must agree with
brute-force ground truth on the planted near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascading_hive_spark.operators import dedup as D
from cascading_hive_spark.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def brute_force_pairs(spark, docs, threshold):
    """Ground truth: exact word-2-gram Jaccard over ALL pairs."""
    base = docs.select(
        F.col("doc_id").alias("_id"), D.word_shingles(F.col("text"), 2).alias("sh")
    )
    a = base.select(F.col("_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = base.select(F.col("_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", D.jaccard(F.col("sh_a"), F.col("sh_b")).alias("j"))
        .filter(F.col("j") >= threshold)
        .collect()
    )


def test_minhash_lsh_matches_brute_force(spark, docs):
    got = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    truth = {(r.id_a, r.id_b) for r in brute_force_pairs(spark, docs, 0.8)}
    # verification step guarantees no false positives
    assert got <= truth
    # banding (b=16, r=4) catches >= 97% at j=0.8; on the planted
    # near-identical pairs it should catch essentially all of them
    assert len(got) >= 0.9 * len(truth), (len(got), len(truth))


def test_minhash_jaccard_values_are_exact(spark, docs):
    out = D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    truth = {(r.id_a, r.id_b): r.j for r in brute_force_pairs(spark, docs, 0.0)}
    for r in out:
        assert abs(r.jaccard - truth[(r.id_a, r.id_b)]) < 1e-6


def test_exact_dedup_total_preserved(spark, docs):
    out = D.exact_dedup(docs, "doc_id", "text")
    total = out.agg(F.sum("n_copies")).collect()[0][0]
    assert total == docs.count()


def test_simhash_pairs_verified_hamming(spark, docs):
    out = D.simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    assert all(r.hamming <= 3 for r in out)
    # near-identical planted pair (12, 360 share the full shingle set
    # at sf0.001) must land at hamming 0
    ids = {(r.id_a, r.id_b): r.hamming for r in out}
    if (12, 360) in ids:
        assert ids[(12, 360)] == 0


def test_char_ngrams_short_text(spark):
    df = spark.createDataFrame([(1, "ab")], "id long, t string")
    row = df.select(D.char_ngrams(F.col("t"), 3).alias("g")).collect()[0]
    assert row.g == ["ab"]  # shorter than n -> the text itself (substr clamps)
