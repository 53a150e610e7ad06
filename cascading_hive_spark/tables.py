"""Test-data table access.

The driver materializes a deterministic TPC-H-ish star schema plus
``events`` / ``documents`` / ``embeddings`` at
``/root/testdata/sf{0.001,0.01,0.1}`` (TESTDATA.md). Every operator in
``__spark_entry__.queries()`` reads through here so projection/predicate
pushdown applies at the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: they
# grow sub-linearly (region/nation are fixed-size) so a broadcast-hash
# join stays correct on a 1000-executor cluster.
BROADCAST_SAFE = frozenset({"region", "nation"})

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read nanos as long and integer-divide down to
        # micros (DIV, not /, to avoid double-precision loss on ~1e18
        # nanosecond values). DuckDB reads the same column as micro
        # TIMESTAMP, so results align exactly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
