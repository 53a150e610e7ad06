"""Time-series gap handling beyond zero-fill (events_daily_gapfill):
linear interpolation across missing periods — the resample/interpolate
step of metrics pipelines.

Scale shape: ONE shuffle on the series key; the spine explode, the
left join (key+day on already key-partitioned data) and the four
running window passes all reuse that partitioning. The
backward-looking frames are RUNNING frames in both directions (the
"next" values come from a reversed-sort running last(), never a
[current, unboundedFollowing) frame — Spark re-evaluates shrinking
frames per row, O(n^2) on a hot key; see the asof.py note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_daily(
    df: DataFrame,
    key_cols: list[str],
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Fill each key's missing days (within its own observed
    [min(day), max(day)] range) with LINEAR interpolation between the
    nearest observed values; observed rows pass through unchanged,
    and an ``interpolated`` flag marks the filled rows.

    ``df`` must hold at most one row per (key, day) — aggregate first.
    """
    keys = [F.col(k) for k in key_cols]
    bounds = df.groupBy(*key_cols).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    spine = bounds.select(
        *key_cols,
        F.explode(F.sequence("_d0", "_d1", F.expr("INTERVAL 1 DAY"))).alias(day_col),
    )
    j = spine.join(df, [*key_cols, day_col], "left")
    v = F.col(value_col)

    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col(day_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_bwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col(day_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_v = F.last(v, ignorenulls=True).over(w_fwd)
    prev_d = F.last(F.when(v.isNotNull(), F.col(day_col)), ignorenulls=True).over(w_fwd)
    next_v = F.last(v, ignorenulls=True).over(w_bwd)
    next_d = F.last(F.when(v.isNotNull(), F.col(day_col)), ignorenulls=True).over(w_bwd)
    frac = F.datediff(F.col(day_col), prev_d).cast("double") / F.datediff(
        next_d, prev_d
    ).cast("double")
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return j.select(
        *key_cols,
        day_col,
        filled.alias(value_col),
        v.isNull().alias("interpolated"),
    )
