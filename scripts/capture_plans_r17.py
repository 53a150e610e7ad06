"""Capture ``explain("formatted")`` for bench headliners into plans/r17/.

Usage: python scripts/capture_plans.py before|after [names...]

Writes plans/r17/<query>_<tag>.txt for each bench.py HEADLINE query
(or the given subset). Planning only — nothing is executed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from cascading_hive_spark import queries as Q  # noqa: E402
from cascading_hive_spark.plans.explain import formatted_plan  # noqa: E402
from cascading_hive_spark.session import get_session  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("plan-capture")
    qs = Q.queries()
    for name in names:
        try:
            plan = formatted_plan(qs[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — keep capturing the rest
            plan = f"ERROR: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"  wrote {path} ({len(plan)} chars)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
