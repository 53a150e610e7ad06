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


def ewma_forecast(
    daily: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket",
    cnt_col: str = "cnt",
    alpha: float = 0.3,
    one_minus_alpha: float = 0.7,
) -> DataFrame:
    """Simple exponential smoothing over the gap-filled daily series:
    level_t = alpha*x_t + (1-alpha)*level_{t-1}, seeded with x_1; the
    final level IS the one-step-ahead forecast. The recurrence runs as
    a sequential double left-fold (``F.aggregate`` over the
    bucket-sorted array) — the same cross-engine-exact fold idiom as
    the cosine operators, replayed in DuckDB by ``list_reduce`` (whose
    accumulator seeds with the first element, hence the slice-from-2
    here). Both coefficient literals are passed explicitly so the two
    engines multiply by bit-identical doubles.

    Scale: per-key array length = the key's calendar span in days —
    bounded by time, not traffic; one shuffle on the series key.
    """
    xs = F.expr(
        f"transform(array_sort(collect_list(struct({bucket_col}, "
        f"{cnt_col}))), s -> CAST(s.{cnt_col} AS DOUBLE))"
    )
    grouped = daily.groupBy(*key_cols).agg(
        xs.alias("_xs"), F.count(F.lit(1)).alias("n_days")
    )
    ew = F.aggregate(
        F.expr("slice(_xs, 2, size(_xs) - 1)"),
        F.element_at("_xs", 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(one_minus_alpha) * acc,
    )
    return grouped.select(
        *key_cols,
        "n_days",
        F.element_at("_xs", -1).alias("last_obs"),
        (F.round(ew, 6) + F.lit(0.0)).alias("ewma_forecast"),
    )


def mann_kendall(
    daily: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Mann-Kendall monotone-trend test per key over the gap-filled
    daily series: S = sum over i<j of sign(x_j - x_i); the normal
    approximation with the tie correction
    var(S) = (n(n-1)(2n+5) - sum_g t_g(t_g-1)(2t_g+5)) / 18 and the
    continuity-corrected z = (S -/+ 1)/sqrt(var). |z| > 1.96 labels
    the trend at 5% significance. Everything up to the final division
    is exact integer algebra, so the SQL twin replays it bit-for-bit;
    an all-tied series (var = 0) yields NULL z / 'no_trend'.

    Scale: the pairwise self-join is per key over the calendar-bounded
    series (n = days — at 30 days, 435 sign terms per key), never over
    event rows; tie groups and n come from two bounded aggregates.
    """
    d = daily.select(*key_cols, F.col(bucket_col), F.col(cnt_col))
    a, b = d.alias("a"), d.alias("b")
    on = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]
    pairs = a.join(
        b, on + [F.col(f"a.{bucket_col}") < F.col(f"b.{bucket_col}")]
    ).select(
        *[F.col(f"a.{k}").alias(k) for k in key_cols],
        F.when(F.col(f"b.{cnt_col}") > F.col(f"a.{cnt_col}"), F.lit(1))
        .when(F.col(f"b.{cnt_col}") < F.col(f"a.{cnt_col}"), F.lit(-1))
        .otherwise(F.lit(0))
        .alias("_sgn"),
    )
    s_stat = pairs.groupBy(*key_cols).agg(
        F.sum("_sgn").cast("bigint").alias("s_stat")
    )
    ties = (
        d.groupBy(*key_cols, cnt_col)
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("_ng"),
            F.sum(
                F.col("_t")
                * (F.col("_t") - 1)
                * (2 * F.col("_t") + 5)
            ).alias("_tie_term"),
            F.sum("_t").alias("n_days"),
        )
    )
    j = s_stat.join(ties, key_cols)
    var_num = (
        F.col("n_days")
        * (F.col("n_days") - 1)
        * (2 * F.col("n_days") + 5)
        - F.col("_tie_term")
    )
    var_s = var_num.cast("double") / F.lit(18.0)
    z = F.when(
        var_num > 0,
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double") / F.sqrt(var_s),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1).cast("double") / F.sqrt(var_s),
        )
        .otherwise(F.lit(0.0)),
    )
    return j.select(
        *key_cols,
        "n_days",
        "s_stat",
        (F.round(var_s, 6) + F.lit(0.0)).alias("var_s"),
        (F.round(z, 6) + F.lit(0.0)).alias("z"),
        F.when(z > 1.96, F.lit("increasing"))
        .when(z < -1.96, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


def rolling_distinct_users(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Rolling N-day distinct actors per window-end day (the WAU/MAU
    family): a sliding COUNT DISTINCT, which no window frame computes
    directly. Shape: dedupe to (actor, day) pairs first, then each
    pair votes for the ``window_days`` window-ends it falls in
    (array-side ``sequence`` explode — a bounded N-way fan-out of the
    DEDUPED pairs, never of raw events), dedupe votes, count per end
    day. Windows whose end day exceeds the observed span are clipped.

    Scale: raw traffic collapses to distinct (actor, day) before any
    fan-out, so the shuffle is bounded by actors x days x N — at 100
    TB the first distinct is the only traffic-sized stage and it
    combines map-side.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    pairs = df.select(
        F.col(id_col).alias("_actor"),
        F.date_trunc("day", F.col(ts_col)).alias("_day"),
    ).distinct()
    hi = pairs.agg(F.max("_day").alias("_hi"))
    votes = pairs.select(
        "_actor",
        F.explode(
            F.expr(
                f"sequence(_day, _day + interval {window_days - 1} days,"
                " interval 1 day)"
            )
        ).alias("window_end"),
    ).distinct()
    return (
        votes.join(F.broadcast(hi), votes["window_end"] <= hi["_hi"])
        .groupBy("window_end")
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_users"))
    )


def theil_sen_slope(
    daily: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Theil-Sen robust trend slope per key: the MEDIAN of all
    pairwise slopes (x_j - x_i) / (j - i) over the gap-filled daily
    series — the magnitude companion to the Mann-Kendall direction
    test (median-of-slopes tolerates ~29% outliers where OLS breaks).

    The median is computed manually (row_number to the two middle
    ranks, averaged) so both engines pick the identical frontier;
    slopes are exact-integer divisions evaluated identically in IEEE.
    Scale: pairwise over the calendar-bounded series per key (30 days
    -> 435 slopes), never over event rows.
    """
    d = daily.select(*key_cols, F.col(bucket_col), F.col(cnt_col))
    a, b = d.alias("a"), d.alias("b")
    on = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]
    slopes = a.join(
        b, on + [F.col(f"a.{bucket_col}") < F.col(f"b.{bucket_col}")]
    ).select(
        *[F.col(f"a.{k}").alias(k) for k in key_cols],
        (
            (F.col(f"b.{cnt_col}") - F.col(f"a.{cnt_col}")).cast("double")
            / (
                F.datediff(F.col(f"b.{bucket_col}"), F.col(f"a.{bucket_col}"))
            ).cast("double")
        ).alias("_slope"),
    )
    w = Window.partitionBy(*key_cols).orderBy("_slope")
    ranked = slopes.withColumn("_rn", F.row_number().over(w))
    n = slopes.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_pairs"))
    lo = F.floor((F.col("n_pairs") + 1) / 2)
    hi2 = F.floor(F.col("n_pairs") / 2) + 1
    mid = ranked.join(n, key_cols).filter(
        (F.col("_rn") == lo) | (F.col("_rn") == hi2)
    )
    return mid.groupBy(*key_cols).agg(
        F.max("n_pairs").cast("bigint").alias("n_pairs"),
        (
            F.round(F.sum("_slope") / F.count(F.lit(1)), 6) + F.lit(0.0)
        ).alias("slope"),
    )
