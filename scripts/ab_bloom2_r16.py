"""Same-JVM A/B for a wave-5 bloom_probe_broadcast candidate.

OLD (HEAD): k=3 chained broadcast HASH joins of the (word_idx, bits)
sketch table, one per probe position.
NEW (candidate): ONE one-row broadcast of the DENSE word array —
built driver-side via bloom_dense_words (metadata-sized, and it
already guards the m_bits mismatch) and shipped as DATA through
createDataFrame (a LocalTableScan, never a plan literal, so zero
Catalyst churn at any filter size) — then the probe is pure column
expressions: O(1) element_at per position against the array column.
Plan: 3 BroadcastExchange + 3 BroadcastHashJoin -> 1 BroadcastExchange
+ 1 BroadcastNestedLoopJoin (single build row).

Also prints a decomposition: the gram-explode + 3-md5 scan alone (the
probe's compute floor, shared by both shapes) and the filter build
alone, so the join fan-out's true share is visible.

Alternating reps of the FULL docs_bloom_decontaminate_bcast pipeline
in one Spark session; noop sink; untimed warmup; median of 5.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cascading_hive_spark.operators.sketches import (
    _BLOOM_WORD_BITS,
    _bloom_bit,
    _bloom_positions,
    bloom_build,
    bloom_dense_words,
    bloom_probe,
)
from cascading_hive_spark.session import get_session
from cascading_hive_spark.tables import load_table

M_BITS, K = 2_097_152, 3


def probe_broadcast_new(df, item_col, bloom, m_bits, k=3, seed="bf14|",
                        portable=True, out_col="bloom_hit"):
    words = bloom_dense_words(bloom, m_bits)  # collect realizes the build once + guards m_bits
    spark = df.sparkSession
    wdf = spark.createDataFrame([(words,)], "_bw: array<bigint>")
    out = df.join(F.broadcast(wdf))
    cond = None
    for p in _bloom_positions(F.col(item_col), k, m_bits, seed, portable):
        word = F.element_at(F.col("_bw"), (p / _BLOOM_WORD_BITS).cast("int") + 1)
        hit = word.bitwiseAND(_bloom_bit(p)) != 0
        cond = hit if cond is None else (cond & hit)
    return out.withColumn(out_col, cond).drop("_bw")


def grams_of(d):
    toks = F.split(F.col("text"), " ")
    return F.when(
        F.size(toks) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 4),
            lambda p: F.array_join(F.slice(toks, p, 5), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def build_query(spark, sf_dir, probe_fn):
    d = load_table(spark, sf_dir, "documents")
    grams = grams_of(d)
    bench = d.filter(F.pmod(F.col("doc_id"), F.lit(17)) == 0).select(
        F.explode(grams).alias("g")
    )
    bloom = bloom_build(bench, "g", M_BITS, K)
    exploded = d.select("doc_id", F.explode_outer(grams).alias("g"))
    probed = probe_fn(exploded, "g", bloom, M_BITS, K)
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count("g").cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("bloom_hit").cast("long"), F.lit(0)))
            .cast("bigint")
            .alias("n_flagged"),
        )
        .select(
            "doc_id", "n_grams", "n_flagged",
            (F.col("n_flagged") > 0).alias("contaminated"),
        )
    )


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
    spark = get_session("ab-bloom2-r16")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    a = build_query(spark, sf_dir, bloom_probe)
    b = build_query(spark, sf_dir, probe_broadcast_new)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"result diff rows: {diff}", flush=True)
    assert diff == 0

    d = load_table(spark, sf_dir, "documents")
    grams = grams_of(d)

    def run_positions_floor():
        exploded = d.select("doc_id", F.explode_outer(grams).alias("g"))
        pos = exploded.select(
            "doc_id",
            *[p.alias(f"p{j}") for j, p in enumerate(
                _bloom_positions(F.col("g"), K, M_BITS, "bf14|", True))],
        )
        noop(pos)

    def run_build_only():
        bench = d.filter(F.pmod(F.col("doc_id"), F.lit(17)) == 0).select(
            F.explode(grams).alias("g")
        )
        noop(bloom_build(bench, "g", M_BITS, K))

    def run_old():
        noop(build_query(spark, sf_dir, bloom_probe))

    def run_new():
        noop(build_query(spark, sf_dir, probe_broadcast_new))

    bench_fn("decomp: corpus explode + 3 md5 positions", run_positions_floor)
    bench_fn("decomp: bloom build only", run_build_only)
    o1 = bench_fn("bcast decon OLD (3 hash joins)", run_old)
    n1 = bench_fn("bcast decon NEW (1-row dense array)", run_new)
    o2 = bench_fn("bcast decon OLD #2", run_old)
    n2 = bench_fn("bcast decon NEW #2", run_new)
    print(f"ratio new/old = {statistics.median([n1, n2]) / statistics.median([o1, o2]):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
