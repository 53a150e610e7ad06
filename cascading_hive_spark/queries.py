"""Query registry: every operator from SURVEY.md §2 as a named query
with a DuckDB oracle twin.

Each entry is ``name -> (fn(spark, sf_dir) -> DataFrame, oracle_sql | None)``.
Column names are aliased identically on both sides (the driver sorts
columns by name before value-hashing). Conventions for hash-stable
cross-engine results:

- aggregate doubles are ``round(x, 2..6)`` on BOTH sides (Spark and
  DuckDB sum doubles in different orders; rounding absorbs the ulps);
- DuckDB ``sum(integer)`` returns HUGEINT → always ``CAST(... AS
  BIGINT)`` in the oracle to match Spark's LongType;
- result sets are unordered (driver hashes order-insensitively);
  ``orderBy`` appears only where the operator IS top-k/sort.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cascading_hive_spark.operators import relational as R
from cascading_hive_spark.session import tune_for_queries
from cascading_hive_spark.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_for_queries(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Reference-surface operators (SURVEY.md §2.B) over the driver tables
# ---------------------------------------------------------------------------

# B4+B5 — the reference's flagship end-to-end flow: ORC wordcount
# (ORCFileTest.java:238-284): tokenize on its exact punctuation regex
# (empty tokens KEPT and counted — ORCFileTest.java:273-274), group,
# count, order by token.
_WC_PATTERN = r"[ \[\]\(\),.]"


@register(
    "wordcount",
    r"""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(regexp_split_to_array(text, '[ \[\]\(\),.]')) AS token
          FROM documents)
    GROUP BY token ORDER BY token
    """,
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.wordcount(_t(spark, sf_dir, "documents"), "text", _WC_PATTERN)


# B1 — projection / identity (HCatTapTest.java:70: Identity(Fields(...)))
@register(
    "b1_projection",
    "SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.project(_t(spark, sf_dir, "customer"), ["c_custkey", "c_name", "c_mktsegment"])


# B2 — ExpressionFilter REMOVES matching rows (HCatTapTest.java:122:
# filter "col1 > 3" keeps col1 <= 3).
@register(
    "b2_expression_filter",
    """
    SELECT event_id, user_id, event_type, value
    FROM events WHERE NOT (value > 100.0) OR value IS NULL
    """,
)
def q_expression_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    return R.expression_filter(ev, "value > 100.0")


# B3 — CountBy hash aggregate (RCFileTest.java:139)
@register(
    "b3_count_by",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS cnt
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_count_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.count_by(_t(spark, sf_dir, "lineitem"), ["l_returnflag", "l_linestatus"])


# B4 — sort-group + count, ordered output (ORCFileTest.java:255-256)
@register(
    "b4_group_count_sorted",
    "SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
)
def q_group_count_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return R.count_by(o, ["o_orderpriority"]).orderBy("o_orderpriority")


# B5 — regex token explode as a standalone UDTF-shaped op
@register(
    "b5_token_explode",
    r"""
    SELECT doc_id, unnest(regexp_split_to_array(text, '[ \[\]\(\),.]')) AS token
    FROM documents WHERE doc_id < 100
    """,
)
def q_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", F.explode(F.split("text", _WC_PATTERN)).alias("token"))


# B6 — Coerce typed cast (HCatTapTest.java:84-86). Spark double->int
# truncates toward zero; DuckDB rounds — oracle uses floor() to pin
# the same semantics (values are positive).
@register(
    "b6_coerce",
    """
    SELECT l_orderkey, CAST(floor(l_quantity) AS INT) AS qty_int,
           CAST(l_shipdate AS DATE) AS ship_day
    FROM lineitem
    """,
)
def q_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_shipdate")
    out = R.coerce(li, {"l_quantity": "int", "l_shipdate": "date"})
    return out.select(
        "l_orderkey",
        F.col("l_quantity").alias("qty_int"),
        F.col("l_shipdate").alias("ship_day"),
    )


# B7 — string -> typed conversion (ConvertToHiveJavaType.java:39-71):
# JSON property string to typed columns.
@register(
    "b7_typed_extract",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(value AS VARCHAR) IS NOT NULL AS has_value
    FROM events
    """,
)
def q_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.col("value").cast("string").isNotNull().alias("has_value"),
    )


# A24 — nested-object JSON rendering (SerDeUtils.getJSONString,
# SerDeUtils.java:221-389) → to_json(struct(...)).
@register(
    "a24_to_json",
    """
    SELECT n_nationkey,
           to_json(struct_pack(n_name := n_name, n_regionkey := n_regionkey))::VARCHAR AS js
    FROM nation
    """,
)
def q_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(F.struct("n_name", "n_regionkey")).alias("js"),
    )


# A13 — multi-partition union read (TapFactory.java:49-71,
# MultiSourceTap concatenation).
@register(
    "a13_union_partitions",
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_linenumber <= 2
    UNION ALL
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_linenumber > 2
    """,
)
def q_union_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    return li.filter(F.col("l_linenumber") <= 2).union(li.filter(F.col("l_linenumber") > 2))


# RCFile binary quirk (RCFile.java:263-265): binary written as Base64
# text. Short prefix only — Spark's base64 MIME-chunks past 76 chars.
@register(
    "scalar_base64",
    "SELECT doc_id, to_base64(encode(substr(text, 1, 48))) AS b64 FROM documents",
)
def q_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.base64(F.substring("text", 1, 48).cast("binary")).alias("b64"))
