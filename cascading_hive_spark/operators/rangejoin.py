"""Range (interval) join — point-in-interval matching at scale.

Spark plans a naive ``l.ts BETWEEN r.start AND r.end`` join as a
broadcast-nested-loop or cartesian product: O(|L| x |R|) at 100 TB.
This operator uses the standard binning rewrite instead:

1. pick a bucket width ~ the typical interval length;
2. explode each right-side interval into the buckets it covers
   (bounded fan-out = interval/width + 1);
3. equi-join on (key, bucket) — a plain shuffle-hash join Catalyst
   plans and AQE skew-handles like any other;
4. re-check the exact predicate and drop the bucket duplicates.

Cost: one shuffle keyed by (key, bucket); fan-out is bounded by the
interval/width ratio, so shuffle volume is linear in the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    on: tuple[str, str] | None = None,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Join left rows whose timestamp ``left_point`` falls inside
    [right_start, right_end] (inclusive), optionally also matching an
    equality key ``on=(left_key, right_key)``.

    Output: all left columns + all right columns.
    """
    # Bucketing runs on epoch SECONDS, not micros: second values
    # (~1.7e9) divide exactly in double arithmetic, while micro values
    # (~1.7e18) exceed 2^53 and can mis-bucket boundary rows. The
    # exact micro-precision predicate is re-checked after the join.
    # (casts: parquet TIMESTAMP(isAdjustedToUTC=false) arrives as
    # TIMESTAMP_NTZ in Spark 4; the session runs UTC so cast is
    # value-identity.)
    lsec = F.unix_timestamp(F.col(left_point).cast("timestamp"))
    rssec = F.unix_timestamp(F.col(right_start).cast("timestamp"))
    resec = F.unix_timestamp(F.col(right_end).cast("timestamp"))

    lbuck = left.withColumn("__bucket", F.floor(lsec / bucket_seconds).cast("long"))
    rbuck = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(rssec / bucket_seconds).cast("long"),
                F.floor(resec / bucket_seconds).cast("long"),
            )
        ),
    )
    join_keys = ["__bucket"]
    cond = None
    if on is not None:
        lk, rk = on
        cond = lbuck[lk] == rbuck[rk]
    joined = (
        lbuck.join(rbuck, join_keys)
        if cond is None
        else lbuck.join(rbuck, (lbuck["__bucket"] == rbuck["__bucket"]) & cond).drop(
            rbuck["__bucket"]
        )
    )
    lpj = F.unix_micros(F.col(left_point).cast("timestamp"))
    exact = joined.filter(
        (lpj >= F.unix_micros(F.col(right_start).cast("timestamp")))
        & (lpj <= F.unix_micros(F.col(right_end).cast("timestamp")))
    )
    return exact.drop("__bucket")
