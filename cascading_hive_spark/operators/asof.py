"""As-of (backward) join — a time-series operator the reference lacks
entirely (SURVEY.md §2.C: joins absent; nearest public analog is the
ASOF JOIN of DuckDB/QuestDB and pandas.merge_asof).

For each left row (key, ts) find the single right row with the
greatest right_ts <= ts for the same key.

Scale design: the naive formulation is a non-equi range join (quadratic
blow-up per key). This implementation is the union+window pattern:

1. tag right rows, union them with left rows on (key, ts);
2. one shuffle partitions by key and sorts by (ts, tag) — right rows
   sort BEFORE left rows at equal ts so the match is inclusive;
3. ``last(value, ignorenulls=True)`` over rows UNBOUNDED PRECEDING →
   CURRENT carries the latest right payload forward;
4. keep left rows.

Cost: ONE shuffle of |L|+|R| rows, no row explosion, no skew
amplification beyond what the key distribution already has — the same
plan shape a hand-written MergeJoin-asof would produce, but expressed
declaratively so AQE still handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join: latest right row at-or-before each left row.

    ``value_cols`` are the right-side payload columns carried to the
    output. ``how``: "left" keeps unmatched left rows (payload null),
    "inner" drops them.
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(left_by).alias("__k"),
        F.col(left_on).alias("__ts"),
        F.lit(0).alias("__is_right"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(right_by).alias("__k"),
        F.col(right_on).alias("__ts"),
        F.lit(1).alias("__is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows first at equal __ts -> inclusive match (ts >= right_ts)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__is_right") == 0)
    out = filled.select(*lcols, *[F.col(f"__m_{c}").alias(c) for c in value_cols])
    if how == "inner":
        out = out.na.drop(subset=[value_cols[0]])
    return out
