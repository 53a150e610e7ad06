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


def int64_ts_micros_divisor(path: str) -> int:
    """Divisor that converts a raw-int64 ``ts`` column to epoch-MICROS,
    inferred from the column's parquet row-group min statistic rather
    than assumed. Epoch magnitudes are unambiguous across units for any
    plausible event time (1973..2500): nanos ~1e18, micros ~1e15,
    millis ~1e12, seconds ~1e9 — so a silent generator switch from
    nanos to micros can never again shift timestamps 1000x unnoticed
    (ADVICE r5). Raises if the magnitude matches no unit."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    idx = pf.schema_arrow.get_field_index("ts")
    stats = pf.metadata.row_group(0).column(idx).statistics
    v = abs(int(stats.min)) if stats is not None and stats.has_min_max else None
    if v is None:  # no stats written: fall back to reading one value
        v = abs(int(pf.read_row_group(0, columns=["ts"]).column(0)[0].as_py()))
    for divisor, lo, hi in ((1_000, 1e17, 2e19), (1, 1e14, 2e16)):
        if lo <= v < hi:
            return divisor
    if 1e11 <= v < 2e13:  # epoch-millis
        raise ValueError(
            f"events.ts int64 magnitude {v} looks like epoch-MILLIS; "
            "loader only handles nanos/micros — extend the divisor table"
        )
    raise ValueError(f"events.ts int64 magnitude {v} matches no known epoch unit")


def normalize_events_ts(df: DataFrame, int64_divisor: int = 1_000) -> DataFrame:
    """Normalize the ``ts`` column to session-zoned TIMESTAMP micros
    regardless of how the driver materialized it. The data generator has
    shipped both shapes across rounds — TIMESTAMP(NANOS) (read as long
    under nanosAsLong) and timestamp[us] (read as TIMESTAMP_NTZ) — so
    the loader branches on the *loaded* dtype instead of assuming one:

    - integral (legacy nanos-as-long): integer-divide to micros (DIV,
      not ``/``, to avoid double-precision loss on ~1e18 values) by
      ``int64_divisor``, which the loader infers from the stored
      magnitude (int64_ts_micros_divisor) instead of assuming nanos;
    - TIMESTAMP_NTZ: cast to TIMESTAMP — the session tz is pinned UTC
      (session.py), so values are identical and the schema matches what
      DuckDB reports for the same file;
    - TIMESTAMP: pass through.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema["ts"].dataType
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return df.withColumn(
            "ts", F.expr(f"timestamp_micros(ts div {int(int64_divisor)})")
        )
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _footer_probe_path(path: str) -> str:
    """A concrete parquet FILE to footer-probe: the driver testdata
    ships single files, but Spark-written tables (scripts/make_sf1.py
    tiling, any user sink) are DIRECTORIES of part files — pyarrow's
    footer reads need one member, and any member's footer speaks for
    the table (one writer, one schema)."""
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.endswith(".parquet"):
                return os.path.join(path, f)
    return path


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        divisor = 1_000
        probe = _footer_probe_path(path)
        if events_ts_stored_as_nanos(probe):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            import pyarrow.parquet as pq

            if str(pq.read_schema(probe).field("ts").type) == "int64":
                divisor = int64_ts_micros_divisor(probe)
        return normalize_events_ts(spark.read.parquet(path), divisor)
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
