"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cascading_hive_spark``; the registry in
``cascading_hive_spark/queries.py`` keeps each Spark query and its
DuckDB oracle side by side. Run ``python -m cascading_hive_spark.parity``
to check all pairs locally before the driver does.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cascading_hive_spark import queries as _q
from cascading_hive_spark.tables import DEFAULT_SF_DIR


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's own flagship end-to-end flow is the ORC wordcount
    (ORCFileTest.java:238-284): scan → regex token explode → shuffle
    aggregate → sort. Same flow here over the documents table.
    """
    return _q.queries()["wordcount"](spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each query (omitted → rows-only check)."""
    return _q.oracles()
