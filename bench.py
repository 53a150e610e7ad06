"""Benchmark runner (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query executes end-to-end into the
``noop`` sink — full scan/shuffle/compute cost, no driver collect —
which is the honest per-operator wall time at this scale factor.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Headline set: one per operator family (scan/agg, join tree, window,
# asof, LSH dedup, ANN, text, multimodal, sessionize; r8 added one
# per post-r3 family — graph, gram-blocked dedup, CDC merge, SCD2 —
# per VERDICT r7 #3 so regressions there show up in BENCH_rN).
HEADLINE = [
    "wordcount",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_inner",
    "window_rank_orders",
    "asof_join_last_order",
    "events_sessionize",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_knn_join",
    "text_analyze",
    "multimodal_meta",
    "graph_pagerank_hubs",
    "graph_triangle_count",  # r10: promoted after the degree-ordered rewrite
    "dedup_tfidf_cosine",
    "cdc_apply_orders",
    "scd2_point_in_time",
    # r10 (late): the clustered-semantic-dedup and hybrid-retrieval
    # families — kmeans-cell GEMM SemDeDup and BM25+cosine RRF fusion
    "dedup_semantic_pairs",
    "docs_hybrid_rrf",
    # r11: exact-substring REMOVAL (span-island scrub + reassembly)
    "dedup_span_scrub",
    # r12: leakage-safe cluster split (CC over fingerprint pairs)
    "sample_leakage_split",
    # r13: learned quality-classifier scoring (map-only literal-weight
    # scan), the MP4 box-walk video leg, and the CCNet cross-corpus
    # perplexity filter
    "text_quality_classifier",
    "multimodal_video_meta",
    "text_perplexity_buckets",
    # r13 continuation: DSIR selection (weights + map-only score +
    # Gumbel top-k), blocked kNN-density pruning, per-domain quota
    "docs_dsir_select",
    "embedding_knn_density_blocked",
    "docs_domain_cap",
    # r14: character-level exact-substring removal (char-50 islands +
    # splice fold), learned lang-id (all 5 models in ONE map-only
    # fold), and real PNG decode -> luma -> dHash over encoded images
    "dedup_charspan_scrub",
    "text_lang_id_learned",
    "multimodal_png_dhash",
    # r15: the megabit-filter decontamination through the broadcast
    # probe leg, and the four-stage composed curation funnel
    "docs_bloom_decontaminate_bcast",
    "pipeline_curation_funnel",
    # r16 continuation: one row per new family — KMV distinct sketch,
    # RAKE keywords (token-volume string algebra), fixed-round LPA
    "events_kmv_distinct",
    "text_rake_keywords",
    "graph_label_propagation",
    # r16 optimization: BM25 single-scan fold (was three tokenize
    # scans + an (id, term) explode exchange) — tracked standalone so
    # the lexical leg's cost is visible outside docs_hybrid_rrf
    "docs_bm25_topk",
]


def _load1() -> float | None:
    try:
        return os.getloadavg()[0]
    except OSError:
        return None


def _n_java() -> int | None:
    try:
        import subprocess

        out = subprocess.run(
            ["pgrep", "-c", "java"], capture_output=True, text=True
        ).stdout.strip()
        return int(out) if out else 0
    except Exception:
        return None


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Quiet-host protocol (VERDICT r12 #3): BENCH_rN artifacts captured
    # under ambient co-tenant load are trend-unreadable (r12: +7% on
    # untouched code, single movers +37%). Before starting the JVM,
    # wait up to SPARK_GRAFT_BENCH_WAIT_SEC for 1-min load to drop
    # under SPARK_GRAFT_BENCH_MAX_LOAD and for other JVMs to exit;
    # never refuse outright (the driver must still get an artifact) —
    # proceed annotating quiet_host=false so readers know.
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "0.3"))
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_SEC", "300"))
    waited = 0.0
    while True:
        load_start, java_start = _load1(), _n_java()
        quiet = (load_start is None or load_start <= max_load) and (
            java_start is None or java_start == 0
        )
        if quiet or waited >= wait_budget:
            break
        print(
            f"  host busy (load {load_start}, {java_start} java procs); "
            f"waiting ({int(waited)}/{int(wait_budget)}s)",
            file=sys.stderr,
        )
        time.sleep(15)
        waited += 15
    from cascading_hive_spark import queries as Q
    from cascading_hive_spark.session import get_session

    spark = get_session("bench")
    # Warm up JVM codegen + the Python (Arrow) worker pool so the first
    # measured query doesn't absorb session spin-up. Exercises each
    # operator SHAPE (agg, split/explode, window, sort-merge join,
    # global sort, Arrow exchange) on synthetic rows — classes load
    # once here instead of inside the first measured query.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    warm = spark.range(10_000).selectExpr(
        "id", "concat('a b,c.d ', id) AS text", "id % 7 AS k"
    )
    (
        warm.selectExpr("k", "explode(split(text, '[ ,.]')) AS tok")
        .groupBy("k", "tok")
        .count()
        .selectExpr("k", "count", "rank() OVER (PARTITION BY k ORDER BY count) AS r")
        .join(warm.selectExpr("id % 7 AS k", "id AS j").limit(100), "k")
        .orderBy("k", "r")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Fixed-work control aggregation (VERDICT r12 #3): a deterministic
    # pure-CPU workload whose wall time calibrates THIS run's host
    # speed — compare control_agg_sec across rounds before reading any
    # per-query delta as a regression (same work every round, so it
    # moves only with host conditions).
    def control_agg() -> float:
        t0 = time.monotonic()
        spark.range(150_000_000).selectExpr(
            "sum(id * 2654435761 % 1000) AS s"
        ).collect()
        return time.monotonic() - t0

    control_runs = sorted(control_agg() for _ in range(3))
    control_sec = round(control_runs[1], 3)

    # Two more fixed-work control FACETS (r16 finding: a host matched
    # r15's codegen control to the millisecond — 0.262s vs 0.262s —
    # while untouched shuffle- and Python-shaped queries read
    # 1.3-1.7x their r15 medians; a pure range-sum samples only the
    # JIT/ALU facet of host speed). control_shuffle times a real
    # exchange (20M (k, v) rows repartitioned by key into the noop
    # sink — serialization, spill files, fetch); control_python times
    # the Arrow JVM<->Python round trip (2M rows through an identity
    # mapInPandas). Extra JSON fields only — control_agg_sec keeps its
    # cross-round meaning. Compare the facet that matches a query's
    # shape before reading its delta as a regression.
    def control_shuffle() -> float:
        t0 = time.monotonic()
        (
            spark.range(20_000_000)
            .selectExpr("id % 1000000 AS k", "id AS v")
            .repartition("k")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.monotonic() - t0

    def control_python() -> float:
        t0 = time.monotonic()
        (
            spark.range(2_000_000)
            .mapInPandas(lambda it: it, "id long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.monotonic() - t0

    control_shuffle_sec = round(sorted(control_shuffle() for _ in range(3))[1], 3)
    control_python_sec = round(sorted(control_python() for _ in range(3))[1], 3)

    qs = Q.queries()
    # Untimed full-suite warmup sweep (VERDICT r15 #3): the per-query
    # median-of-5 does NOT absorb SUITE-level JIT/page-cache warm-up —
    # the first recorded bench run in a fresh JVM read 20-30% above
    # steady state two rounds running (r14's entire perf-watch was this
    # artifact; r15 run A 64.9s vs run B 52.8s minutes apart on the
    # same HEAD). One untimed pass over every headline query loads the
    # generated classes, JITs the hot loops, and faults the parquet
    # pages into cache, so the recorded pass below is a WARM reading —
    # no more manual two-run adjudication. Disable with
    # SPARK_GRAFT_BENCH_WARMUP=0 (e.g. to measure cold-start itself).
    warmup_sweep = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    warmup_sec = None
    if warmup_sweep:
        t0 = time.monotonic()
        for name in HEADLINE:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        warmup_sec = round(time.monotonic() - t0, 1)
        print(
            f"  warmup sweep (untimed): {warmup_sec}s over "
            f"{len(HEADLINE)} queries",
            file=sys.stderr,
        )
    timings: dict[str, float] = {}
    n_iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5"))
    for name in HEADLINE:
        fn = qs[name]
        # n=5, report the median: a single draw in a shared container
        # has +-30% variance (round 1 showed it can masquerade as a 5x
        # regression, round 5 saw an isolated 36s outlier on a 4s
        # query); median-of-5 survives two co-tenant spikes per query
        runs = []
        for _ in range(n_iters):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)
        print(
            f"  {name}: median {timings[name]}s of {[round(r, 2) for r in runs]}",
            file=sys.stderr,
        )
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # Host-contention context (VERDICT r5 #6): three rounds of verdicts
    # had to hand-wave co-tenant noise; record it in the artifact
    # instead. load_avg is the 1/5/15-min system load; n_java is how
    # many other JVMs were alive at the end of the run.
    try:
        load_avg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_avg = None
    try:
        import subprocess

        out = subprocess.run(
            ["pgrep", "-c", "java"], capture_output=True, text=True
        ).stdout.strip()
        n_java = int(out) if out else 0
    except Exception:
        n_java = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "quiet_host": quiet,
                "load_avg_start": round(load_start, 2)
                if load_start is not None
                else None,
                "waited_for_quiet_sec": int(waited),
                "control_agg_sec": control_sec,
                "control_shuffle_sec": control_shuffle_sec,
                "control_python_sec": control_python_sec,
                "warmup_sweep": warmup_sweep,
                "warmup_sweep_sec": warmup_sec,
                "load_avg": load_avg,
                "n_java_procs": n_java,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
