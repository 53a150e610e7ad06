"""Pins for the r17 optimization round's structural changes.

Each optimization here changed an operator's INTERNALS (partitioning,
lineage cuts, gram construction) while the results must stay
bit-identical — these tests pin both the shape and the equivalence.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_scaled_state_partitions_formula(spark, sf_dir, monkeypatch):
    """State-store count derives from the replay source's row count,
    clamped to [1, defaultParallelism], with an env override."""
    from cascading_hive_spark.streaming.jobs import scaled_state_partitions

    # sf0.001 events: 1000 rows -> ceil(1000/250k) = 1
    assert scaled_state_partitions(spark, sf_dir) == 1
    # small rows_per_part pushes toward the core clamp
    dp = spark.sparkContext.defaultParallelism
    assert scaled_state_partitions(spark, sf_dir, rows_per_part=1) == dp
    monkeypatch.setenv("SPARK_GRAFT_STATE_PARTITIONS", "5")
    assert scaled_state_partitions(spark, sf_dir) == 5


def test_state_partitions_context_restores(spark):
    from cascading_hive_spark.streaming.jobs import state_partitions

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with state_partitions(spark, 3):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_dsir_weights_flag_and_union_identical(spark, sf_dir):
    """The spread()-ed single-scan target_flag path and the two-corpus
    union path count the same grams -> identical weight lists (the
    r17 adjudication invariant, VERDICT r16 #1)."""
    from cascading_hive_spark.operators.corpus import dsir_weights
    from cascading_hive_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    flag = dsir_weights(d, None, "text", target_flag=F.col("lang") == "en")
    union = dsir_weights(d, d.filter(F.col("lang") == "en"), "text")
    assert flag == union
    assert len(flag) == 128


def test_bloom_gram5_index_explode_matches_array_form(spark, sf_dir):
    """The index-sequence gram rows equal the old inline-split array
    form (including the explode_outer NULL row per under-5-token
    doc)."""
    from cascading_hive_spark.queries import (
        _bloom_gram5_of,
        _bloom_gram5_seq,
        _bloom_gram5_tokens,
    )
    from cascading_hive_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    # old formulation, verbatim from the r16 query body
    toks = F.split(F.col("text"), " ")
    grams = F.when(
        F.size(toks) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 4),
            lambda p: F.array_join(F.slice(toks, p, 5), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    old = d.select("doc_id", F.explode_outer(grams).alias("g"))
    dt = _bloom_gram5_tokens(d)
    new = dt.select(
        "doc_id", "_toks", F.explode_outer(_bloom_gram5_seq()).alias("_p")
    ).select("doc_id", _bloom_gram5_of(F.col("_p")).alias("g"))
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_binary_auc_checkpoint_single_upstream_execution(spark):
    """binary_auc's thin projection is a lineage cut: the (expensive)
    upstream scorer must evaluate once per row, not once per
    consumer. Counted with an accumulator through a Python UDF."""
    from pyspark.sql.types import DoubleType

    from cascading_hive_spark.operators.relational import binary_auc

    acc = spark.sparkContext.accumulator(0)

    def scored(x: float) -> float:
        acc.add(1)
        return x

    udf = F.udf(scored, DoubleType())
    df = spark.range(100).select(
        udf((F.col("id") % 7).cast("double")).alias("score"),
        (F.col("id") % 2).alias("y"),
    )
    out = binary_auc(df, "score", "y").collect()
    assert len(out) == 1
    # one evaluation per row (the pre-r17 shape ran the scorer once
    # per consumer: >= 200)
    assert acc.value == 100


def test_corr_matrix_spread_preserves_moments(spark, sf_dir):
    """corr_matrix's spread() repartition cannot move the decimal
    moments: compare against a COALESCE(1) run of the same input."""
    from cascading_hive_spark.operators.relational import corr_matrix
    from cascading_hive_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    )
    wide = corr_matrix(li, li.columns).collect()
    narrow = corr_matrix(li.coalesce(1), li.columns).collect()
    assert sorted(map(tuple, wide)) == sorted(map(tuple, narrow))
