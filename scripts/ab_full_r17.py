"""Same-JVM FULL-QUERY A/B timing for the r17 optimization round.

Imports the pre-optimization package (git a96e6cb (r16 close), copied to
/tmp/oldpkg17/old_chs with its internal imports rewritten) next to the
current tree, and times old vs new FULL query pipelines back-to-back
in one session (noop sink, one untimed warmup each, alternating runs,
median-of-3) — host drift cancels, and nothing has to be hand-inlined.

Setup (idempotent, done by the session driver):
    git worktree add /tmp/oldtree <BASE>
    cp -r /tmp/oldtree/cascading_hive_spark /tmp/oldpkg17/old_chs
    grep -rl cascading_hive_spark /tmp/oldpkg17/old_chs \
      | xargs sed -i 's/cascading_hive_spark/old_chs/g'

Usage: python scripts/ab_full_r17.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/tmp/oldpkg17")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ITERS = int(os.environ.get("AB_ITERS", "3"))


def main() -> int:
    from cascading_hive_spark import queries as NEWQ
    from cascading_hive_spark.session import get_session
    import old_chs.queries as OLDQ

    spark = get_session("ab_full_r17")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    def control():
        t0 = time.monotonic()
        spark.range(150_000_000).selectExpr("sum(id * 2654435761 % 1000) AS s").collect()
        return time.monotonic() - t0

    print(f"control_agg: {sorted(control() for _ in range(3))[1]:.3f}s", flush=True)

    names = sys.argv[1:]
    newq, oldq = NEWQ.queries(), OLDQ.queries()
    for name in names:
        if name not in newq or name not in oldq:
            print(f"{name}: MISSING (old={name in oldq}, new={name in newq})", flush=True)
            continue
        old_fn = lambda: oldq[name](spark, SF_DIR)  # noqa: E731
        new_fn = lambda: newq[name](spark, SF_DIR)  # noqa: E731
        try:
            for fn in (old_fn, new_fn):  # untimed warmup
                fn().write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {exc!r}", flush=True)
            continue
        olds, news = [], []
        for _ in range(N_ITERS):
            for fn, acc in ((old_fn, olds), (new_fn, news)):
                t0 = time.monotonic()
                fn().write.format("noop").mode("overwrite").save()
                acc.append(time.monotonic() - t0)
        mo, mn = sorted(olds)[len(olds) // 2], sorted(news)[len(news) // 2]
        print(
            f"{name}: old median {mo:.3f}s {[round(x, 2) for x in olds]} | "
            f"new median {mn:.3f}s {[round(x, 2) for x in news]} | "
            f"ratio {mn / mo:.2f}",
            flush=True,
        )
    print(f"control_agg end: {sorted(control() for _ in range(3))[1]:.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
