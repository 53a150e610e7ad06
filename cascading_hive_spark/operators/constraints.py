"""Declarative data-quality constraint checking — the Deequ/dbt-test
role for this engine: declare row predicates, key uniqueness, and
referential integrity; get back one (rule, n_violations) report row
per constraint.

Scale shape: ALL row-level predicates are verified in ONE conditional
aggregation over a single scan (no per-rule pass — at 100 TB the scan
is the budget and it is paid once). Uniqueness adds one key-shuffle
per key set; referential integrity one anti-join per reference, with
the parent side reduced to distinct keys first (broadcast-eligible
when the parent is a dimension). The report itself is
constraint-sized, not data-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_report(
    df: DataFrame,
    checks: list[tuple[str, Column]] | None = None,
    unique: list[list[str]] | None = None,
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Violation counts for every declared constraint.

    - ``checks``: (rule_name, predicate) pairs; a row VIOLATES when
      the predicate is not true (nulls violate — declare an explicit
      ``isNotNull`` disjunct when nulls are acceptable).
    - ``unique``: column lists that must be row-unique; violations =
      rows carrying a key that occurs more than once.
    - ``references``: (child_col, parent_df, parent_col) — violations
      = rows whose non-null child value has no parent match (SQL FK
      semantics: nulls never violate).
    """
    spark = df.sparkSession
    parts: list[DataFrame] = []
    if checks:
        names = [name for name, _ in checks]
        if len(set(names)) != len(names):
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(f"duplicate rule names: {dupes}")
        # when(pred, 0).otherwise(1): a NULL predicate falls through to
        # otherwise — nulls violate, as documented (when(~pred, 1)
        # would silently skip nulls: NOT NULL is NULL, not true)
        #
        # aggregates are aliased POSITIONALLY (_chk_i), never by the
        # user-supplied rule name: re-resolving F.col(name) would parse
        # dots/backticks in a rule name as nested-field access
        aggs = [
            F.sum(F.when(pred, F.lit(0)).otherwise(F.lit(1))).alias(f"_chk_{i}")
            for i, (_, pred) in enumerate(checks)
        ]
        one = df.agg(*aggs)
        stack_args: list[Column] = []
        for i, (name, _) in enumerate(checks):
            stack_args += [F.lit(name), F.coalesce(F.col(f"_chk_{i}"), F.lit(0))]
        parts.append(
            one.select(
                F.stack(F.lit(len(checks)), *stack_args).alias("rule", "n_violations")
            )
        )
    for keys in unique or []:
        dup_rows = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("n_violations"))
        )
        parts.append(
            dup_rows.select(
                F.lit(f"unique({', '.join(keys)})").alias("rule"), "n_violations"
            )
        )
    for child_col, parent, parent_col in references or []:
        orphans = (
            df.filter(F.col(child_col).isNotNull())
            .join(
                parent.select(F.col(parent_col).alias(child_col)).distinct(),
                child_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )
        parts.append(
            orphans.select(
                F.lit(f"references({child_col} -> {parent_col})").alias("rule"),
                "n_violations",
            )
        )
    if not parts:
        return spark.createDataFrame([], "rule string, n_violations bigint")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("rule", F.col("n_violations").cast("bigint").alias("n_violations"))
