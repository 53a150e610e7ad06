"""Spark 4 Python DataSource: custom source registered and read like a
built-in format, partition-parallel, deterministic content."""

from __future__ import annotations

from pyspark.sql import functions as F


def _read(spark, **opts):
    from cascading_hive_spark.sources.pysource import register

    register(spark)
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_custom_source_reads_with_schema_and_count(spark):
    df = _read(spark, n=500, n_partitions=4)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 500
    row = df.filter(F.col("doc_id") == 42).first()
    assert row.n_chars == len(row.text) and row.lang in ("en", "de", "fr", "es", "pt")


def test_custom_source_partition_parallelism(spark):
    df = _read(spark, n=1000, n_partitions=5)
    assert df.rdd.getNumPartitions() == 5
    # content is partition-independent: 1 partition == 5 partitions
    a = sorted(map(tuple, _read(spark, n=100, n_partitions=1).collect()))
    b = sorted(map(tuple, _read(spark, n=100, n_partitions=7).collect()))
    assert a == b


def test_custom_source_supports_pushed_projection_downstream(spark):
    # column pruning happens above a python source; the narrow select
    # still works end-to-end and yields stable aggregates
    out = (
        _read(spark, n=2000, n_partitions=8)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert out.agg(F.sum("n")).first()[0] == 2000
