"""Physical-plan assertions.

The reference hand-implements its two optimizations (column projection
ids, partition filters) and trusts Hive for the rest (SURVEY.md §4).
On Spark those arrive via Catalyst — but ONLY if the query is written
so they apply. These helpers make the plan properties testable, so a
regression that silently un-prunes a scan or degrades a broadcast join
to cartesian fails CI instead of costing 100x at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_read_schema(df: DataFrame, must_include: list[str], must_exclude: list[str]) -> None:
    """Column pruning reached the scan: ReadSchema contains exactly the
    needed columns (the Catalyst form of hive.io.file.readcolumn.ids,
    RCFile.java:136-141)."""
    plan = formatted_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, f"no file scan in plan:\n{plan}"
    joined = ";".join(schemas)
    for c in must_include:
        assert c in joined, f"column {c} missing from ReadSchema {joined}"
    for c in must_exclude:
        assert c not in joined, f"column {c} NOT pruned from ReadSchema {joined}"


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Predicate pushdown reached the source (PushedFilters in the
    scan node)."""
    plan = formatted_plan(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and any(fragment in f for f in m), (
        f"no pushed filter containing {fragment!r}; got {m}\n{plan}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join:\n{plan}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"unexpected cartesian product:\n{plan}"


def plan_report(df, name: str = "") -> dict:
    """One-line plan-quality summary for a query: which scan columns,
    pushed filters, join strategies, and red flags (cartesian)."""
    import re as _re

    fplan = formatted_plan(df)
    pplan = physical_plan(df)
    return {
        "name": name,
        "read_schemas": _re.findall(r"ReadSchema: struct<([^>]*)>", fplan),
        "pushed_filters": [f for f in _re.findall(r"PushedFilters: \[([^\]]*)\]", fplan) if f],
        "joins": sorted(
            set(_re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", pplan))
        ),
        "has_cartesian": "CartesianProduct" in pplan,
        "take_ordered": "TakeOrderedAndProject" in pplan,
        "exchanges": pplan.count("Exchange "),
    }


def main() -> int:
    """CLI: plan-quality audit of every registered query.

    ``python -m cascading_hive_spark.plans.explain [names...]``
    """
    import json
    import os
    import sys

    from cascading_hive_spark import queries as Q
    from cascading_hive_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_session("plan-audit")
    names = sys.argv[1:] or list(Q._REGISTRY)
    for name in names:
        fn, _ = Q._REGISTRY[name]
        try:
            rep = plan_report(fn(spark, sf_dir), name)
            flag = " !! CARTESIAN" if rep["has_cartesian"] else ""
            print(json.dumps(rep) + flag)
        except Exception as exc:  # noqa: BLE001 — audit keeps going
            print(json.dumps({"name": name, "error": repr(exc)[:200]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
