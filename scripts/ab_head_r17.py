"""Same-JVM FULL-QUERY A/B timing vs the r17 mid-round HEAD (0028278).

Same protocol as ab_full_r17.py (noop sink, untimed warmup each side,
alternating runs, median-of-3, control facet), but the "old" side is
the CURRENT round's last committed HEAD copied to /tmp/headpkg17/
head_chs — for adjudicating changes made AFTER that commit.

Setup (idempotent):
    git worktree add /tmp/headtree <HEAD>
    mkdir -p /tmp/headpkg17
    cp -r /tmp/headtree/cascading_hive_spark /tmp/headpkg17/head_chs
    grep -rl cascading_hive_spark /tmp/headpkg17/head_chs \
      | xargs sed -i 's/cascading_hive_spark/head_chs/g'

Usage: python scripts/ab_head_r17.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/tmp/headpkg17")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ITERS = int(os.environ.get("AB_ITERS", "3"))


def main() -> int:
    from cascading_hive_spark import queries as NEWQ
    from cascading_hive_spark.session import get_session
    import head_chs.queries as OLDQ

    spark = get_session("ab_head_r17")
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
