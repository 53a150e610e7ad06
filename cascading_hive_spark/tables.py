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


def events_ts_stored_as_nanos(path: str) -> bool:
    """True when the parquet footer stores ``ts`` as TIMESTAMP(NANOS)
    (or a raw int64 of nanoseconds) — the shape Spark's reader rejects
    unless ``spark.sql.legacy.parquet.nanosAsLong`` is set. Probed from
    the footer (pyarrow) so the flag is only flipped when actually
    needed; micro/milli timestamps read natively."""
    import pyarrow.parquet as pq

    t = pq.read_schema(path).field("ts").type
    return str(t) == "int64" or getattr(t, "unit", None) == "ns"


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to session-zoned TIMESTAMP micros
    regardless of how the driver materialized it. The data generator has
    shipped both shapes across rounds — TIMESTAMP(NANOS) (read as long
    under nanosAsLong) and timestamp[us] (read as TIMESTAMP_NTZ) — so
    the loader branches on the *loaded* dtype instead of assuming one:

    - integral (legacy nanos-as-long): integer-divide to micros (DIV,
      not ``/``, to avoid double-precision loss on ~1e18 values);
    - TIMESTAMP_NTZ: cast to TIMESTAMP — the session tz is pinned UTC
      (session.py), so values are identical and the schema matches what
      DuckDB reports for the same file;
    - TIMESTAMP: pass through.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema["ts"].dataType
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        if events_ts_stored_as_nanos(path):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
