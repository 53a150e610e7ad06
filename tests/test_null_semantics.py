"""Null-handling corners from SURVEY.md §7's risk register, exercised
with explicitly-constructed null rows (the driver tables are
null-free, so these paths need synthetic data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cascading_hive_spark.operators import relational as R


def test_expression_filter_keeps_null_rows(spark):
    # Cascading ExpressionFilter evaluates Java primitives — a null
    # never reaches the comparison, so null rows are NOT removed.
    # Spark three-valued logic would drop them with a bare ~expr.
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 150.0), (4, None), (5, 99.9)],
        "id int, v double",
    )
    kept = R.expression_filter(df, "v > 100.0").collect()
    ids = sorted(r.id for r in kept)
    assert ids == [1, 2, 4, 5]  # 3 removed; null rows 2 and 4 KEPT


def test_asof_join_left_keeps_unmatched(spark):
    from cascading_hive_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7), (2, "2024-01-01 09:00:00", 8)],
        "eid int, ts string, k int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("2024-01-01 09:30:00", 7, 100)], "rts string, rk int, payload int"
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    out = asof_join(
        left, right, "ts", "rts", "k", "rk", ["payload"], how="left"
    ).collect()
    by = {r.eid: r.payload for r in out}
    assert by == {1: 100, 2: None}  # eid=2 precedes all rights -> null kept
    inner = asof_join(left, right, "ts", "rts", "k", "rk", ["payload"], how="inner")
    assert [r.eid for r in inner.collect()] == [1]


def test_asof_join_inclusive_at_equal_ts(spark):
    from cascading_hive_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 7)], "eid int, ts string, k int"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("2024-01-01 09:30:00", 7, 42)], "rts string, rk int, payload int"
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    out = asof_join(left, right, "ts", "rts", "k", "rk", ["payload"]).collect()
    assert out[0].payload == 42  # ts == right ts matches (inclusive)


def test_count_by_counts_null_keys_as_group(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), (None,)], "k string")
    got = {r.k: r.cnt for r in R.count_by(df, ["k"]).collect()}
    assert got == {"a": 2, None: 2}  # SQL group-by keeps a NULL group


def test_tokenize_null_text_yields_no_rows(spark):
    df = spark.createDataFrame([(1, "a b"), (2, None)], "id int, t string")
    out = R.tokenize(df, "t", " ")
    assert out.count() == 2  # explode(null array) emits nothing
