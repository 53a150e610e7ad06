"""Same-JVM three-way adjudication of docs_dsir_select's weights job
(VERDICT r16 item 1): the r16 target_flag single scan (old code, no
spread), the r17 spread()-ed target_flag single scan, and the r15-style
two-corpus union formulation (with the r17 spread, so the comparison is
about the FORMULATION, not the partitioning fix). All three run the
full query pipeline (weights collect + score + gumbel top-k) into the
noop sink, alternating, median-of-3 after one untimed warmup each.

Usage: python scripts/ab_dsir_r17.py
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
    from pyspark.sql import functions as F

    from cascading_hive_spark.operators.corpus import (
        dsir_gumbel_topk,
        dsir_score,
        dsir_weights,
    )
    from cascading_hive_spark.session import get_session
    from cascading_hive_spark.tables import load_table
    import old_chs.operators.corpus as OLDC

    spark = get_session("ab_dsir_r17")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def control():
        t0 = time.monotonic()
        spark.range(150_000_000).selectExpr(
            "sum(id * 2654435761 % 1000) AS s"
        ).collect()
        return time.monotonic() - t0

    print(f"control_agg: {sorted(control() for _ in range(3))[1]:.3f}s", flush=True)

    d = load_table(spark, SF_DIR, "documents")

    def flag_old():
        w = OLDC.dsir_weights(d, None, "text", target_flag=F.col("lang") == "en")
        return dsir_gumbel_topk(
            OLDC.dsir_score(d, "doc_id", "text", w), "doc_id", k=50
        )

    def flag_new():
        w = dsir_weights(d, None, "text", target_flag=F.col("lang") == "en")
        return dsir_gumbel_topk(
            dsir_score(d, "doc_id", "text", w), "doc_id", k=50
        )

    def two_corpus():
        w = dsir_weights(d, d.filter(F.col("lang") == "en"), "text")
        return dsir_gumbel_topk(
            dsir_score(d, "doc_id", "text", w), "doc_id", k=50
        )

    variants = [
        ("flag_old_r16", flag_old),
        ("flag_new_r17", flag_new),
        ("two_corpus_r15", two_corpus),
    ]
    # weights must agree exactly across formulations
    wf = dsir_weights(d, None, "text", target_flag=F.col("lang") == "en")
    wu = dsir_weights(d, d.filter(F.col("lang") == "en"), "text")
    print(f"weights identical flag-vs-union: {wf == wu}", flush=True)

    for _, fn in variants:  # untimed warmup
        fn().write.format("noop").mode("overwrite").save()
    accs: dict[str, list[float]] = {n: [] for n, _ in variants}
    for _ in range(N_ITERS):
        for n, fn in variants:
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            accs[n].append(time.monotonic() - t0)
    for n, runs in accs.items():
        med = sorted(runs)[len(runs) // 2]
        print(f"{n}: median {med:.3f}s {[round(x, 2) for x in runs]}", flush=True)
    print(f"control_agg end: {sorted(control() for _ in range(3))[1]:.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
