"""Same-JVM A/B for the r16 wave-3 `_assign_cells` rework.

OLD: crossJoin(broadcast(cents)) -> per-id row_number window (all n*k
scored rows cross the exchange, each dragging the vector, plus a sort).
NEW: crossJoin(broadcast(cents)) -> map-side-combinable max(struct)
aggregate (k candidates collapse to 1 row per vector before the
exchange; no sort).  Alternating reps in one Spark session so host
drift cancels; noop sink; untimed warmup; median of 5.
"""
import os
import statistics
import time

from pyspark.sql import functions as F

from cascading_hive_spark.session import get_session
from cascading_hive_spark.operators.similarity import (
    _assign_cells as assign_new,
    _dim_of,
    _mean_centroids,
    cosine,
    ivf_build,
)
from cascading_hive_spark.tables import load_table


def assign_old(vectors, centroids, id_col, vec_col):
    from pyspark.sql import Window

    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cell"),
        cosine(F.col(vec_col), F.col("centroid")).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col("cell"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r", "_sim")
    )


def bench(label, fn, reps=5):
    fn()  # warmup
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    med = statistics.median(ts)
    print(f"{label:28s} median={med:.3f}s  all={[round(t, 3) for t in ts]}", flush=True)
    return med


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab-assign-r16")
    emb = load_table(spark, sf_dir, "embeddings")
    # centroids exactly as ivf_build seeds them: (cell, centroid array)
    dim = _dim_of(emb, "embedding")
    seed = emb.select(
        F.abs(F.xxhash64(F.col("vec_id")) % 16).alias("cell"),
        F.col("embedding"),
    )
    cents = _mean_centroids(seed, "embedding", dim).localCheckpoint()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_old():
        noop(assign_old(emb, cents, "vec_id", "embedding"))

    def run_new():
        noop(assign_new(emb, cents, "vec_id", "embedding"))

    # verify identical output first
    a = assign_old(emb, cents, "vec_id", "embedding")
    b = assign_new(emb, cents, "vec_id", "embedding")
    diff = a.select("vec_id", "cell").exceptAll(b.select("vec_id", "cell")).count()
    diff += b.select("vec_id", "cell").exceptAll(a.select("vec_id", "cell")).count()
    print(f"assignment diff rows: {diff}", flush=True)
    assert diff == 0, "OLD and NEW assignments differ!"

    # interleaved A/B
    o1 = bench("assign OLD (window)", run_old)
    n1 = bench("assign NEW (aggregate)", run_new)
    o2 = bench("assign OLD (window) #2", run_old)
    n2 = bench("assign NEW (aggregate) #2", run_new)
    print(f"ratio new/old = {statistics.median([n1, n2]) / statistics.median([o1, o2]):.3f}")

    # full ivf_build (two _assign_cells passes internally = NEW at HEAD)
    def run_build():
        asg, _ = ivf_build(emb, n_cells=16)
        noop(asg)

    bench("ivf_build n=16 NEW", run_build, reps=3)
    spark.stop()


if __name__ == "__main__":
    main()
