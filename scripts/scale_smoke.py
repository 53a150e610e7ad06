"""Scale smokes behind the BASELINE.md numbers — reproducible runners
for the synthetic-corpus measurements (the sf0.1 bench verifies
wall-clock on the driver tables; these verify the SHAPE of the scaling
curve at 100k-1M rows, where a quadratic path or flooded LSH bucket
would show immediately).

Usage: python scripts/scale_smoke.py <name> [args]
    ivf_knn   [n=100000] [n_queries=200] [n_cells=64]
    simhash   [n=500000]
    cc        [n_edges=100000]
    elsh_auto [n=1000000]

Each prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from cascading_hive_spark.session import get_session


def _spark():
    s = get_session("scale-smoke", master="local[32]", shuffle_partitions=64)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _timed(df) -> tuple[float, int]:
    t0 = time.monotonic()
    n = df.count()
    return round(time.monotonic() - t0, 1), n


def smoke_ivf_knn(n: int = 100_000, n_queries: int = 200, n_cells: int = 64) -> None:
    """Batched IVF ANN join: recall vs brute-force knn_join and wall
    time as nprobe scales — cost should track nprobe/n_cells."""
    from cascading_hive_spark.operators.similarity import ivf_build, ivf_knn_join, knn_join
    from cascading_hive_spark.sources.synthetic import synthetic_embeddings

    spark = _spark()
    emb = synthetic_embeddings(spark, n=n, dim=64, n_clusters=32).localCheckpoint()
    queries = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .localCheckpoint()
    )
    t0 = time.monotonic()
    truth_rows = knn_join(emb, queries, k=10, query_id_col="query_id").collect()
    brute_wall = round(time.monotonic() - t0, 1)
    truth: dict[int, set[int]] = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    print(json.dumps({"smoke": "ivf_knn", "stage": "brute_force", "n": n,
                      "n_queries": n_queries, "wall_sec": brute_wall}))

    t0 = time.monotonic()
    assignments, centroids = ivf_build(emb, n_cells=n_cells)
    assignments = assignments.localCheckpoint()
    build_wall = round(time.monotonic() - t0, 1)
    print(json.dumps({"smoke": "ivf_knn", "stage": "build", "n_cells": n_cells,
                      "wall_sec": build_wall}))

    for nprobe in (2, 8, 32):
        t0 = time.monotonic()
        rows = ivf_knn_join(
            assignments, centroids, queries, k=10, nprobe=nprobe
        ).collect()
        wall = round(time.monotonic() - t0, 1)
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.vec_id)
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        total = sum(len(t) for t in truth.values())
        print(json.dumps({
            "smoke": "ivf_knn", "stage": "probe", "nprobe": nprobe,
            "n_cells": n_cells, "wall_sec": wall,
            "recall": round(hits / total, 4),
        }))


def smoke_simhash(n: int = 500_000) -> None:
    """simhash_pairs at corpus scale: wall time + pair volume (the
    4x16-bit pigeonhole blocking must stay near-linear)."""
    from cascading_hive_spark.operators.dedup import simhash_pairs
    from cascading_hive_spark.sources.synthetic import synthetic_documents

    spark = _spark()
    docs = synthetic_documents(spark, n=n, dup_rate=0.02, n_vocab=5000).localCheckpoint()
    wall, n_pairs = _timed(simhash_pairs(docs, "doc_id", "text", max_hamming=3))
    print(json.dumps({"smoke": "simhash", "n_docs": n, "wall_sec": wall,
                      "n_pairs": n_pairs}))


def smoke_cc(n_edges: int = 100_000) -> None:
    """connected_components on a dedup-shaped pair graph (many small
    components) plus one adversarial 10k chain under the star
    algorithm."""
    from cascading_hive_spark.operators.graph import connected_components

    spark = _spark()
    # dedup-shaped: components of ~6 vertices (id // 5 clusters, edges
    # i -> i+1 within a cluster plus a skip edge)
    base = spark.range(0, n_edges)
    edges = base.select(
        F.col("id").alias("id_a"),
        F.when(F.col("id") % 5 < 4, F.col("id") + 1)
        .otherwise(F.col("id") - 4)
        .alias("id_b"),
    ).localCheckpoint()
    t0 = time.monotonic()
    labels = connected_components(edges)
    n_comp = labels.select("component").distinct().count()
    wall = round(time.monotonic() - t0, 1)
    print(json.dumps({"smoke": "cc", "shape": "dedup_clusters",
                      "n_edges": n_edges, "n_components": n_comp,
                      "wall_sec": wall}))

    chain = spark.range(0, 10_000).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    ).localCheckpoint()
    t0 = time.monotonic()
    labels = connected_components(chain, algorithm="star", max_iterations=25)
    n_comp = labels.select("component").distinct().count()
    wall = round(time.monotonic() - t0, 1)
    print(json.dumps({"smoke": "cc", "shape": "chain_10k_star",
                      "n_components": n_comp, "wall_sec": wall}))


def smoke_elsh_auto(n: int = 1_000_000) -> None:
    """embedding_lsh_pairs with DEFAULT (auto-sized) band bits at 1M
    vectors: must stay near-linear without manual bit tuning."""
    from cascading_hive_spark.operators.dedup import embedding_lsh_pairs
    from cascading_hive_spark.sources.synthetic import synthetic_embeddings

    spark = _spark()
    for size in (n // 10, n):
        emb = synthetic_embeddings(
            spark, n=size, dim=64, n_clusters=size, dup_rate=0.02
        ).localCheckpoint()
        t0 = time.monotonic()
        pairs = embedding_lsh_pairs(
            emb, "vec_id", "embedding", threshold=0.9
        )
        n_pairs = pairs.count()
        wall = round(time.monotonic() - t0, 1)
        print(json.dumps({"smoke": "elsh_auto", "n_vectors": size,
                          "wall_sec": wall, "n_pairs": n_pairs,
                          "planted": int(size * 0.02)}))


def smoke_packing(n: int = 1_000_000) -> None:
    """pack_sequences at corpus scale: wall time and utilization as n
    grows 10x — per-group walks must stay embarrassingly parallel."""
    from pyspark.sql import functions as FF

    from cascading_hive_spark.operators.packing import pack_sequences, packing_stats
    from cascading_hive_spark.sources.synthetic import synthetic_documents

    spark = _spark()
    for size in (n // 10, n):
        docs = synthetic_documents(spark, n=size, n_vocab=5000).localCheckpoint()
        t0 = time.monotonic()
        packed = pack_sequences(docs, "doc_id", text_col="text", capacity=2048, n_groups=512)
        stats = packing_stats(packed, 2048)
        row = stats.agg(
            FF.count(FF.lit(1)).alias("n_seqs"),
            FF.round(FF.avg("utilization"), 4).alias("avg_util"),
        ).first()
        wall = round(time.monotonic() - t0, 1)
        print(json.dumps({"smoke": "packing", "n_docs": size, "wall_sec": wall,
                          "n_sequences": row["n_seqs"],
                          "avg_utilization": row["avg_util"]}))


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "ivf_knn"
    args = [int(a) for a in sys.argv[2:]]
    {
        "ivf_knn": smoke_ivf_knn,
        "simhash": smoke_simhash,
        "cc": smoke_cc,
        "elsh_auto": smoke_elsh_auto,
        "packing": smoke_packing,
    }[name](*args)
