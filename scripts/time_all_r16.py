"""One-pass noop timing of EVERY registered query at a given SF.

Purpose (r16 optimization round): the bench's 37 headliners have
per-round medians, but the other ~225 registered queries have never
been timed as a set — a slow non-headliner is invisible until the
driver's correctness sweep eats it. One warm pass each (after an
untimed JVM warmup), noop sink, job-labelled. Not a regression gate
(single draw), a TRIAGE list: anything that reads far above its
family's peers gets a real median-of-5 + plan read.

Usage: python scripts/time_all_r16.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from cascading_hive_spark import queries as Q
    from cascading_hive_spark.session import get_session

    spark = get_session("time_all_r16")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    t0 = time.monotonic()
    spark.range(150_000_000).selectExpr("sum(id * 2654435761 % 1000) AS s").collect()
    control = time.monotonic() - t0
    print(f"control_agg: {control:.3f}s", flush=True)

    qs = Q.queries()
    out: dict[str, float] = {}
    fails: list[str] = []
    for name in sorted(qs):
        spark.sparkContext.setJobDescription(f"time_all: {name}")
        try:
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            out[name] = round(time.monotonic() - t0, 3)
            print(f"  {out[name]:7.2f}  {name}", flush=True)
        except Exception as exc:  # noqa: BLE001
            fails.append(name)
            print(f"  FAIL     {name}: {exc!r}", flush=True)
    spark.sparkContext.setJobDescription(None)

    t0 = time.monotonic()
    spark.range(150_000_000).selectExpr("sum(id * 2654435761 % 1000) AS s").collect()
    control_end = time.monotonic() - t0

    payload = {
        "sf_dir": SF_DIR,
        "control_start": round(control, 3),
        "control_end": round(control_end, 3),
        "total": round(sum(out.values()), 1),
        "n": len(out),
        "fails": fails,
        "queries": out,
    }
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/time_all_r16.json"
    with open(dest, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"wrote {dest}: n={len(out)} total={payload['total']}s fails={fails}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
