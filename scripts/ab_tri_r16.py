"""Same-JVM A/B for a wave-5 triangle_count candidate.

OLD (HEAD): the oriented edge list ``o`` (compact-forward orientation
= scan -> canonical distinct -> degree agg -> two joins) feeds THREE
consumers — out_pairs (keyed a), heads (keyed a), and the closing
left_semi (keyed b,c). Their required distributions differ, so the
exchanges above ``o`` are NOT identical and ReusedExchange cannot
dedup the subtree: the orientation pipeline executes once per
consumer (the perplexity c1-vs-c2 / KMV union-key pattern).

NEW (candidate): ``o`` is localCheckpoint(eager=False)-ed — edge-scale,
the k_core/pagerank per-round discipline — so the orientation runs
once and the three consumers read the materialized blocks.

Alternating reps in one Spark session; noop sink; untimed warmup;
median of 5; output-identity check first (exact integer counts).
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cascading_hive_spark.session import get_session
from cascading_hive_spark.tables import load_table


def triangle_count_impl(edges, checkpoint_o):
    src, dst = "src", "dst"
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    outd = e.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("outdeg"))
    ind = e.groupBy(F.col("v").alias("node")).agg(F.count(F.lit(1)).alias("indeg"))
    n_wedges = outd.join(ind, "node").agg(
        F.coalesce(F.sum(F.col("indeg") * F.col("outdeg")), F.lit(0))
        .cast("bigint")
        .alias("n_wedges")
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = e.join(
        deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    if checkpoint_o:
        o = o.localCheckpoint(eager=False)
    heads = o.select("a", F.col("b").alias("c"), F.col("db").alias("dc"))
    out_pairs = o.join(heads, "a").filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closed = out_pairs.join(
        o.select(F.col("a").alias("b"), F.col("b").alias("c")),
        ["b", "c"],
        "left_semi",
    )
    return n_wedges.crossJoin(closed.agg(F.count(F.lit(1)).alias("n_triangles")))


def bench_fn(label, fn, reps=5):
    fn()  # warmup
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    med = statistics.median(ts)
    print(f"{label:40s} median={med:.3f}s  all={[round(t, 3) for t in ts]}",
          flush=True)
    return med


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab-tri-r16")
    # the registered query's edge construction: per-nation ring+hub
    # windows over customer (so the duplicated subtree includes the
    # windows, not just a scan)
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    w_ring = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    ring = c.select(
        F.col("c_custkey").alias("src"),
        F.lead("c_custkey").over(w_ring).alias("dst"),
    )
    hub = c.select(
        F.col("c_custkey").alias("src"),
        F.min("c_custkey").over(Window.partitionBy("c_nationkey")).alias("dst"),
    )
    edges = ring.unionByName(hub).filter(
        F.col("dst").isNotNull() & (F.col("src") != F.col("dst"))
    )

    a = triangle_count_impl(edges, False).collect()
    b = triangle_count_impl(edges, True).collect()
    print(f"old={a} new={b}", flush=True)
    assert a == b

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_old():
        noop(triangle_count_impl(edges, False))

    def run_new():
        noop(triangle_count_impl(edges, True))

    o1 = bench_fn("triangle OLD (o re-executed x3)", run_old)
    n1 = bench_fn("triangle NEW (o checkpointed)", run_new)
    o2 = bench_fn("triangle OLD #2", run_old)
    n2 = bench_fn("triangle NEW #2", run_new)
    print(f"ratio new/old = {statistics.median([n1, n2]) / statistics.median([o1, o2]):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
