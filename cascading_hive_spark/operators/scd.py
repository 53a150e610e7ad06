"""Slowly-changing-dimension (SCD type 2) maintenance.

The reference has no dimension-history operator (its sinks overwrite
partitions — CascadingHCatUtil.java's location swap); SCD2 is the
standard warehouse pattern layered on top of such sinks, so it belongs
in the §2.C "capability" surface: compact a change feed into validity
windows ``[valid_from, valid_to)`` with an ``is_current`` flag.

Scale shape: ONE shuffle on the dimension key (the two window passes
share the same ``partitionBy(key) orderBy(eff)`` spec, so Catalyst
plans a single sort+exchange); no joins, no driver-side state. At
100 TB of change feed the per-key partitions are the only sort cost,
and dimension keys are many — this parallelizes embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_compact(
    changes: DataFrame,
    key_col: str,
    eff_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """Compact a raw change feed into SCD2 history rows.

    ``changes`` holds one row per observed state ``(key, eff, attrs)``;
    the output holds one row per DISTINCT consecutive state with
    ``valid_from`` = first effective time of the run, ``valid_to`` =
    start of the next run (NULL while current), ``is_current``.

    Three window steps over the same (key × eff) order:
      1. collapse same-instant duplicates — keep the row with the
         highest ``tiebreak_col`` (last writer wins, deterministic);
      2. drop no-op changes — rows whose attrs equal the previous
         surviving row's attrs (null-safe comparison);
      3. validity windows — ``lead(eff)`` over the survivors.
    """
    order = [F.col(eff_col).asc(), F.col(tiebreak_col).desc()]
    w = Window.partitionBy(key_col).orderBy(*order)

    # 1. same-instant dedupe: first row per (key, eff) in tiebreak order
    per_instant = Window.partitionBy(key_col, eff_col).orderBy(
        F.col(tiebreak_col).desc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(per_instant))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # 2. change-only compaction: a row starts a new run iff any attr
    # differs (null-safely) from the previous row's value
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.lag(F.col(eff_col)).over(w).isNull()
    runs = latest.withColumn("_new_run", first | changed).filter(F.col("_new_run"))

    # 3. validity windows over the surviving run-starts
    w2 = Window.partitionBy(key_col).orderBy(F.col(eff_col).asc())
    return (
        runs.withColumn("valid_from", F.col(eff_col))
        .withColumn("valid_to", F.lead(F.col(eff_col)).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key_col, *attr_cols, "valid_from", "valid_to", "is_current")
    )
