"""Engine function library, exposed to the SQL surface.

The Column-expression builders live in ``operators/`` for the
DataFrame API; this module registers the same semantics as pure SQL
functions (Spark 4 ``CREATE TEMPORARY FUNCTION ... RETURN <expr>``) so
``spark.sql`` users get them too — the role the reference's Scalding
wrappers play for its Scala surface (ColumnarSerDeSource.scala, A22),
and a JVM-side (never Python-UDF) path in both APIs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, body). All bodies are deterministic Catalyst
# expressions: registering them N times is idempotent (REPLACE).
_SQL_FUNCTIONS: dict[str, tuple[str, str]] = {
    # sequential double dot/cosine — the determinism contract of
    # operators/similarity.py, usable from SQL
    "vec_dot": (
        "(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> cast(x AS DOUBLE) * cast(y AS DOUBLE)), "
        "cast(0.0 AS DOUBLE), (acc, v) -> acc + v)",
    ),
    "vec_cosine": (
        "(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE",
        "vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))",
    ),
    "arr_jaccard": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS DOUBLE",
        "cast(size(array_intersect(a, b)) AS DOUBLE) / cast(size(array_union(a, b)) AS DOUBLE)",
    ),
    "ws_tokens": (
        "(t STRING) RETURNS INT",
        "size(split(trim(t), '\\\\s+'))",
    ),
    "doc_fingerprint": (
        "(t STRING) RETURNS STRING",
        "md5(array_join(array_sort(array_distinct(split(lower(t), '\\\\s+'))), ' '))",
    ),
    "punct_ratio": (
        "(t STRING) RETURNS DOUBLE",
        "cast(length(t) - length(regexp_replace(t, '[^\\\\w\\\\s]', '')) AS DOUBLE) "
        "/ cast(length(t) AS DOUBLE)",
    ),
}


def install_sql_functions(spark: SparkSession) -> list[str]:
    """Register the engine's SQL function library on this session.
    Returns the installed names. Idempotent."""
    for name, (sig, body) in _SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}")
    return list(_SQL_FUNCTIONS)
