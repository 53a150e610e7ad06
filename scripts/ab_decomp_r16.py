"""Stage-level same-JVM A/B decomposition of the similarity-path
regression found by ab_full_r16 (semantic 1.99x, knn_density 1.70x).

Pairs:
  kmeans_fit   — full trainer old vs new
  sdp_given    — semantic_dedup_pairs on IDENTICAL checkpointed centroids
  ivf_build    — ivf_build_portable assignments old vs new
  knn_given    — knn_density_blocked on IDENTICAL checkpointed inputs

Requires /tmp/oldpkg/old_chs (see ab_full_r16.py header) and
PYTHONPATH=/tmp/oldpkg for executors (old_chs applyInPandas closures).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/tmp/oldpkg")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from cascading_hive_spark.session import get_session
    from cascading_hive_spark.tables import load_table
    import cascading_hive_spark.operators.similarity as NS
    import cascading_hive_spark.operators.dedup as ND
    import old_chs.operators.similarity as OS
    import old_chs.operators.dedup as OD

    spark = get_session("ab_decomp_r16")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    def control():
        t0 = time.monotonic()
        spark.range(150_000_000).selectExpr("sum(id * 2654435761 % 1000) AS s").collect()
        return time.monotonic() - t0

    print(f"control_agg: {sorted(control() for _ in range(3))[1]:.3f}s", flush=True)

    e = load_table(spark, SF_DIR, "embeddings")

    # shared, checkpointed inputs (built with the NEW code, identical
    # bits either way — the trainers are bit-identical by contract)
    cents = NS.kmeans_fit(e, k=8, iters=2).localCheckpoint()
    assignments, centroids = NS.ivf_build_portable(e, n_cells=8)
    assignments = assignments.localCheckpoint()
    centroids = centroids.localCheckpoint()

    pairs = [
        ("kmeans_fit", lambda: OS.kmeans_fit(e, k=8, iters=2),
         lambda: NS.kmeans_fit(e, k=8, iters=2)),
        ("sdp_given", lambda: OD.semantic_dedup_pairs(e, cents, threshold=0.5),
         lambda: ND.semantic_dedup_pairs(e, cents, threshold=0.5)),
        ("ivf_build", lambda: OS.ivf_build_portable(e, n_cells=8)[0],
         lambda: NS.ivf_build_portable(e, n_cells=8)[0]),
        ("knn_given", lambda: OS.knn_density_blocked(assignments, centroids, k=5, nprobe=2),
         lambda: NS.knn_density_blocked(assignments, centroids, k=5, nprobe=2)),
    ]
    names = sys.argv[1:]
    for name, old_fn, new_fn in pairs:
        if names and name not in names:
            continue
        try:
            for fn in (old_fn, new_fn):
                fn().write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {exc!r}", flush=True)
            continue
        olds, news = [], []
        for _ in range(3):
            for fn, acc in ((old_fn, olds), (new_fn, news)):
                t0 = time.monotonic()
                fn().write.format("noop").mode("overwrite").save()
                acc.append(time.monotonic() - t0)
        mo, mn = sorted(olds)[1], sorted(news)[1]
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
