"""Same-JVM A/B: cdc_apply `latest` lineage — leave the pruned re-scan
(HEAD) vs localCheckpoint(eager=False) the latest change rows.

The two consumers of `latest` (anti-join build = keys only, `applied`
= full payload) sit over column-pruned variants of the same window
exchange, so ReusedExchange cannot dedup them — but the duplicated leg
is exactly the THIN one (FileScan [key] + key-only shuffle), which is
cheap by construction. The checkpoint trades that pruned re-scan for
materializing the WIDE change rows once. Measured to decide.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window

from cascading_hive_spark.session import get_session
from cascading_hive_spark.tables import load_table


def cdc_apply_impl(target, changes, keys, checkpoint_latest,
                   seq_col="seq", op_col="op"):
    payload = [c for c in changes.columns if c not in (*keys, seq_col, op_col)]
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        F.col(op_col).desc(),
        F.xxhash64(*[F.col(c) for c in payload]) if payload else F.lit(0),
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if checkpoint_latest:
        latest = latest.localCheckpoint(eager=False)
    untouched = target.join(latest.select(*keys), keys, "left_anti")
    applied = latest.filter(F.col(op_col) != "D").drop(seq_col, op_col)
    return untouched.unionByName(applied)


def build_query(spark, sf_dir, checkpoint_latest):
    o = load_table(spark, sf_dir, "orders")
    target = o.select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    changes = (
        o.filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 1.1, 2).alias("price"),
            F.lit("U").alias("op"),
            F.lit(1).alias("seq"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 97 == 0).select(
                "o_orderkey",
                F.lit(0.0).alias("price"),
                F.lit("D").alias("op"),
                F.lit(2).alias("seq"),
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") < 5).select(
                (F.col("o_orderkey") + 20_000_000).alias("o_orderkey"),
                F.lit(1.0).alias("price"),
                F.lit("I").alias("op"),
                F.lit(1).alias("seq"),
            )
        )
    )
    return cdc_apply_impl(target, changes, ["o_orderkey"], checkpoint_latest)


def bench_fn(label, fn, reps=5):
    fn()
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
    spark = get_session("ab-cdc-r16")

    a = build_query(spark, sf_dir, False)
    b = build_query(spark, sf_dir, True)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"result diff rows: {diff}", flush=True)
    assert diff == 0

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_old():
        noop(build_query(spark, sf_dir, False))

    def run_new():
        noop(build_query(spark, sf_dir, True))

    o1 = bench_fn("cdc OLD (pruned re-scan)", run_old)
    n1 = bench_fn("cdc NEW (latest checkpointed)", run_new)
    o2 = bench_fn("cdc OLD #2", run_old)
    n2 = bench_fn("cdc NEW #2", run_new)
    print(f"ratio new/old = {statistics.median([n1, n2]) / statistics.median([o1, o2]):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
