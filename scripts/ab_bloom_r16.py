"""Same-JVM A/B for the r16 wave-4 bloom_probe_broadcast lineage cut.

OLD: the m_bits precheck agg executes the corpus-scale Bloom-build
lineage once, then the k broadcast probe joins re-execute it.
NEW (HEAD): the sketch table (≤ m_bits/63+1 rows) is localCheckpointed
before the precheck, so the build runs exactly once.

Alternating reps of the FULL docs_bloom_decontaminate_bcast pipeline
in one Spark session (old probe inlined below); noop sink; untimed
warmup; median of 5.
"""
import os
import statistics
import time

from pyspark.sql import functions as F

from cascading_hive_spark.operators.sketches import (
    _BLOOM_WORD_BITS,
    _bloom_bit,
    _bloom_positions,
    bloom_build,
    bloom_probe,
)
from cascading_hive_spark.session import get_session
from cascading_hive_spark.tables import load_table

M_BITS, K = 2_097_152, 3


def probe_broadcast_old(df, item_col, bloom, m_bits, k=3, seed="bf14|",
                        portable=True, out_col="bloom_hit"):
    n_words = m_bits // _BLOOM_WORD_BITS + 1
    rng = bloom.agg(
        F.min("word_idx").alias("lo"), F.max("word_idx").alias("hi")
    ).first()
    if rng["hi"] is not None and not (0 <= rng["lo"] and rng["hi"] < n_words):
        raise ValueError("m_bits mismatch")
    out = df
    cond = None
    for j in range(k):
        p = _bloom_positions(F.col(item_col), k, m_bits, seed, portable)[j]
        bj = bloom.select(
            F.col("word_idx").alias(f"_bw{j}"), F.col("bits").alias(f"_bb{j}")
        )
        out = out.withColumn(f"_bp{j}", p).join(
            F.broadcast(bj),
            (F.col(f"_bp{j}") / _BLOOM_WORD_BITS).cast("int") == F.col(f"_bw{j}"),
            "left",
        )
        hit = (
            F.coalesce(F.col(f"_bb{j}"), F.lit(0).cast("bigint")).bitwiseAND(
                _bloom_bit(F.col(f"_bp{j}"))
            )
            != 0
        )
        cond = hit if cond is None else (cond & hit)
    return out.withColumn(out_col, cond).drop(
        *[c for j in range(k) for c in (f"_bp{j}", f"_bw{j}", f"_bb{j}")]
    )


def build_query(spark, sf_dir, probe_fn):
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    grams = F.when(
        F.size(toks) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 4),
            lambda p: F.array_join(F.slice(toks, p, 5), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
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
    print(f"{label:36s} median={med:.3f}s  all={[round(t, 3) for t in ts]}",
          flush=True)
    return med


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab-bloom-r16")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_old():
        noop(build_query(spark, sf_dir, probe_broadcast_old))

    def run_new():
        noop(build_query(spark, sf_dir, bloom_probe))

    a = build_query(spark, sf_dir, probe_broadcast_old)
    b = build_query(spark, sf_dir, bloom_probe)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"result diff rows: {diff}", flush=True)
    assert diff == 0

    o1 = bench_fn("bcast decon OLD (no checkpoint)", run_old)
    n1 = bench_fn("bcast decon NEW (checkpointed)", run_new)
    o2 = bench_fn("bcast decon OLD #2", run_old)
    n2 = bench_fn("bcast decon NEW #2", run_new)
    print(f"ratio new/old = {statistics.median([n1, n2]) / statistics.median([o1, o2]):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
