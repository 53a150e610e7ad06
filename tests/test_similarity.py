"""Similarity-search semantics: brute force is ground truth; IVF is
graded on recall against it."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cascading_hive_spark.operators import similarity as S
from cascading_hive_spark.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_cosine_matches_python(spark, emb):
    rows = emb.filter(F.col("vec_id") < 2).collect()
    a, b = rows[0].embedding, rows[1].embedding
    expected = sum(x * y for x, y in zip(a, b)) / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )
    got = (
        emb.filter(F.col("vec_id") == 0)
        .crossJoin(
            emb.filter(F.col("vec_id") == 1).select(F.col("embedding").alias("e2"))
        )
        .select(S.cosine(F.col("embedding"), F.col("e2")).alias("c"))
        .collect()[0]
        .c
    )
    assert abs(got - expected) < 1e-12


def test_topk_is_sorted_and_self_first(spark, emb):
    query = emb.filter(F.col("vec_id") == 0)
    out = S.cosine_topk(emb, query, k=10).collect()
    assert len(out) == 10
    assert out[0].vec_id == 0 and abs(out[0].cos_sim - 1.0) < 1e-9
    sims = [r.cos_sim for r in out]
    assert sims == sorted(sims, reverse=True)


def test_ivf_recall_against_brute_force(spark, emb):
    query = emb.filter(F.col("vec_id") == 0)
    truth = {r.vec_id for r in S.cosine_topk(emb, query, k=10).collect()}
    assignments, centroids = S.ivf_build(emb, n_cells=16)
    assert assignments.count() == emb.count()  # every vector lands in a cell
    got = {r.vec_id for r in S.ivf_search(assignments, centroids, query, k=10, nprobe=4).collect()}
    recall = len(got & truth) / len(truth)
    # floors are smoke-justified (VERDICT r12 #5): the build is
    # deterministic (hash seeding + Lloyd on fixed data), measured
    # 0.7 @ nprobe=4 and 1.0 @ nprobe=8 — gate just under so only a
    # real recall regression trips, not float jitter
    assert recall >= 0.6, f"IVF recall {recall} too low for nprobe=4/16 cells"
    got8 = {
        r.vec_id
        for r in S.ivf_search(assignments, centroids, query, k=10, nprobe=8).collect()
    }
    recall8 = len(got8 & truth) / len(truth)
    assert recall8 >= 0.9, f"IVF recall {recall8} too low for nprobe=8/16 cells"
    # Lloyd refinement must not LOSE recall vs the raw hash seeding
    a0, c0 = S.ivf_build(emb, n_cells=16, refine_iterations=0)
    got0 = {r.vec_id for r in S.ivf_search(a0, c0, query, k=10, nprobe=4).collect()}
    recall0 = len(got0 & truth) / len(truth)
    assert recall >= recall0, (recall, recall0)
    # full probe == brute force (sanity: approximation comes only from pruning)
    got_all = {
        r.vec_id for r in S.ivf_search(assignments, centroids, query, k=10, nprobe=16).collect()
    }
    assert got_all == truth


def test_knn_join_each_query_gets_k(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = S.knn_join(emb, queries, k=5).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        assert sorted(r.rnk for r in rows) == [1, 2, 3, 4, 5]
        assert rows[0].vec_id == q  # self is nearest


def test_ivf_knn_join_full_probe_equals_brute_force(spark, emb):
    """nprobe = n_cells degenerates to brute force: the batched IVF
    join must reproduce knn_join exactly (same scores, same ranks)."""
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        (r.query_id, r.vec_id, r.rnk)
        for r in S.knn_join(emb, queries, k=5).collect()
    }
    assignments, centroids = S.ivf_build(emb, n_cells=8)
    got = {
        (r.query_id, r.vec_id, r.rnk)
        for r in S.ivf_knn_join(assignments, centroids, queries, k=5, nprobe=8).collect()
    }
    assert got == truth


def test_ivf_build_portable_deterministic_and_full_probe_exact(spark, emb):
    """ivf_build_portable's centroids are EXACT decimal-sum means: the
    same doubles under any partitioning (a float avg is partition-
    order-dependent — the property the portable twin needs); and full
    probe still degenerates to brute force."""
    a1, c1 = S.ivf_build_portable(emb, n_cells=8)
    a2, c2 = S.ivf_build_portable(emb.repartition(7), n_cells=8)
    cents1 = {r.cell: list(r.centroid) for r in c1.collect()}
    cents2 = {r.cell: list(r.centroid) for r in c2.collect()}
    assert cents1 == cents2  # bit-identical, not approximately equal
    assign1 = {r.vec_id: r.cell for r in a1.collect()}
    assign2 = {r.vec_id: r.cell for r in a2.collect()}
    assert assign1 == assign2
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        (r.query_id, r.vec_id, r.rnk)
        for r in S.knn_join(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.rnk)
        for r in S.ivf_knn_join(a1, c1, queries, k=5, nprobe=8).collect()
    }
    assert got == truth


def test_pq_train_portable_deterministic_and_composes(spark, emb):
    """Portable PQ codebook: partitioning-independent (seed points,
    no float accumulation) and drop-in for pq_encode/pq_search_rerank."""
    c1 = S.pq_train_portable(emb, m=8, k=16)
    c2 = S.pq_train_portable(emb.repartition(5), m=8, k=16)
    rows1 = {(r.sub, r.cell): list(r.centroid) for r in c1.collect()}
    rows2 = {(r.sub, r.cell): list(r.centroid) for r in c2.collect()}
    assert rows1 == rows2  # bit-identical
    assert len(rows1) == 8 * 16
    codes = S.pq_encode(emb, c1, m=8)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = S.pq_search_rerank(
        codes, emb, c1.collect(), [float(x) for x in q], m=8, topk=10, shortlist=100
    ).collect()
    assert len(out) == 10
    assert out[0].vec_id == 0 and out[0].dist < 1e-9  # self survives shortlist


def test_ivfpq_build_portable_deterministic(spark, emb):
    """Portable IVF-PQ: index (cell + codes) identical under
    repartitioning — the property the end-to-end DuckDB twin needs."""
    i1, c1, p1 = S.ivfpq_build_portable(emb, n_cells=8, m=8, k=16)
    i2, c2, p2 = S.ivfpq_build_portable(emb.repartition(5), n_cells=8, m=8, k=16)
    idx1 = {r.vec_id: (r.cell, list(r.codes)) for r in i1.collect()}
    idx2 = {r.vec_id: (r.cell, list(r.codes)) for r in i2.collect()}
    assert idx1 == idx2
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = S.ivfpq_search(
        i1, c1.collect(), p1.collect(), [float(x) for x in q],
        m=8, nprobe=8, topk=10, shortlist=100, vectors=emb,
    ).collect()
    assert len(out) == 10
    # full probe + wide shortlist: self must surface with ~zero distance
    assert out[0].vec_id == 0 and out[0].dist < 1e-9


def test_ivf_knn_join_recall_at_partial_probe(spark, emb):
    """Partial probe: every query still gets k rows, ranks are dense,
    and recall vs brute force is high at nprobe=nc/2."""
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {}
    for r in S.knn_join(emb, queries, k=5).collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    assignments, centroids = S.ivf_build(emb, n_cells=8)
    rows = S.ivf_knn_join(assignments, centroids, queries, k=5, nprobe=4).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(truth)
    hits = total = 0
    for q, qrows in by_q.items():
        assert sorted(r.rnk for r in qrows) == [1, 2, 3, 4, 5]
        assert qrows[0].vec_id != q or qrows[0].cos_sim >= 0.999999  # self probe hit
        hits += len({r.vec_id for r in qrows} & truth[q])
        total += len(truth[q])
    # measured 0.85 @ nprobe=4/8 on the deterministic build (VERDICT
    # r12 #5); gate just under the measurement
    assert hits / total >= 0.8, f"batched IVF recall {hits/total} too low"
    # and the half-probe step to nprobe=8 (full probe) must recover
    # >= 0.9 — it equals brute force by construction
    rows8 = S.ivf_knn_join(assignments, centroids, queries, k=5, nprobe=8).collect()
    by_q8: dict = {}
    for r in rows8:
        by_q8.setdefault(r.query_id, set()).add(r.vec_id)
    hits8 = sum(len(by_q8[q] & truth[q]) for q in truth)
    assert hits8 / total >= 0.9, f"batched IVF recall {hits8/total} at full probe"


def test_ivf_knn_join_from_disk_prunes_and_agrees(spark, emb, tmp_path):
    """Disk-backed batched probe: partition pruning reaches the scan
    and the result equals the in-memory ivf_knn_join on the same
    index."""
    path = str(tmp_path / "ivf_idx_batch")
    assignments, centroids = S.ivf_build(emb, n_cells=16)
    S.ivf_write(assignments, centroids, path)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = S.ivf_knn_join_from_disk(spark, path, queries, k=5, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    got = {(r.query_id, r.vec_id, r.rnk) for r in out.collect()}
    mem = {
        (r.query_id, r.vec_id, r.rnk)
        for r in S.ivf_knn_join(assignments, centroids, queries, k=5, nprobe=2).collect()
    }
    assert got == mem and len(got) == 10


def test_ivf_disk_index_prunes_partitions(spark, emb, tmp_path):
    path = str(tmp_path / "ivf_index")
    assignments, centroids = S.ivf_build(emb, n_cells=16)
    S.ivf_write(assignments, centroids, path)
    query = emb.filter(F.col("vec_id") == 0)
    out = S.ivf_probe_from_disk(spark, path, query, k=10, nprobe=4)
    # partition pruning reached the scan: only the probed cells' files
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    rows = out.collect()
    assert len(rows) == 10
    # must agree with the in-memory probe on the same index
    mem = {r.vec_id for r in S.ivf_search(assignments, centroids, query, k=10, nprobe=4).collect()}
    assert {r.vec_id for r in rows} == mem


# --- product quantization -------------------------------------------
def test_pq_codes_shape_and_determinism(spark):
    from pyspark.sql import functions as F

    from cascading_hive_spark.operators.similarity import pq_encode, pq_train
    from cascading_hive_spark.sources.synthetic import synthetic_embeddings

    emb = synthetic_embeddings(spark, n=2000, dim=64, n_clusters=16).localCheckpoint()
    cent = pq_train(emb, m=8, k=16)
    assert cent.count() == 8 * 16  # full codebook, no collapsed cells
    codes = pq_encode(emb, cent, m=8)
    row = codes.agg(
        F.min(F.size("codes")).alias("mn"),
        F.max(F.size("codes")).alias("mx"),
        F.max(F.array_max("codes")).alias("cmax"),
        F.min(F.array_min("codes")).alias("cmin"),
    ).first()
    assert row["mn"] == row["mx"] == 8
    assert 0 <= row["cmin"] and row["cmax"] <= 15
    again = pq_encode(emb.repartition(7), pq_train(emb.repartition(5), m=8, k=16), m=8)
    a = {r.vec_id: list(r.codes) for r in codes.collect()}
    b = {r.vec_id: list(r.codes) for r in again.collect()}
    assert a == b  # content-addressed: partitioning never changes codes


def test_pq_rerank_recall_on_clustered_data(spark):
    from pyspark.sql import functions as F

    from cascading_hive_spark.operators.similarity import (
        pq_encode,
        pq_search,
        pq_search_rerank,
        pq_train,
    )
    from cascading_hive_spark.sources.synthetic import synthetic_embeddings

    emb = synthetic_embeddings(spark, n=5000, dim=64, n_clusters=32).localCheckpoint()
    q = emb.filter(F.col("vec_id") == 7).select("embedding").first()["embedding"]
    qlit = F.lit([float(x) for x in q]).cast("array<double>")
    exact = (
        emb.select(
            "vec_id",
            F.aggregate(
                F.zip_with("embedding", qlit, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
        .orderBy("d")
        .limit(10)
        .collect()
    )
    truth = {r.vec_id for r in exact}
    cent = pq_train(emb, m=8, k=64)
    rows = cent.collect()
    codes = pq_encode(emb, cent, m=8).localCheckpoint()
    # ADC alone: the query's own row must sit AT the minimum ADC
    # distance (cluster-mates with identical codes tie exactly, and
    # the id tie-break may order them first — that is correct PQ)
    adc = pq_search(codes, rows, list(q), m=8, topk=5000).collect()
    d7 = next(r.adc_dist for r in adc if r.vec_id == 7)
    assert d7 == adc[0].adc_dist
    got = {
        r.vec_id
        for r in pq_search_rerank(
            codes, emb, rows, list(q), m=8, topk=10, shortlist=200
        ).collect()
    }
    assert len(got & truth) >= 9  # exact re-rank recovers the true neighbors


def test_pq_train_rejects_indivisible_dim(spark):
    import pytest

    from cascading_hive_spark.operators.similarity import pq_train
    from cascading_hive_spark.sources.synthetic import synthetic_embeddings

    emb = synthetic_embeddings(spark, n=100, dim=64, n_clusters=4)
    with pytest.raises(ValueError):
        pq_train(emb, m=7)


def test_ivfpq_recall_and_cell_pruning(spark):
    from pyspark.sql import functions as F

    from cascading_hive_spark.operators.similarity import ivfpq_build, ivfpq_search
    from cascading_hive_spark.sources.synthetic import synthetic_embeddings

    emb = synthetic_embeddings(spark, n=5000, dim=64, n_clusters=32).localCheckpoint()
    index, coarse, pqc = ivfpq_build(emb, n_cells=16, m=8, k=64)
    index = index.localCheckpoint()
    coarse_rows, pq_rows = coarse.collect(), pqc.collect()
    q = emb.filter(F.col("vec_id") == 7).select("embedding").first()["embedding"]
    qv = [float(x) for x in q]
    qlit = F.lit(qv).cast("array<double>")
    truth = {
        r.vec_id
        for r in emb.select(
            "vec_id",
            F.aggregate(
                F.zip_with("embedding", qlit, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
        .orderBy("d")
        .limit(10)
        .collect()
    }
    got = {
        r.vec_id
        for r in ivfpq_search(
            index, coarse_rows, pq_rows, qv, m=8, nprobe=2, topk=10,
            shortlist=200, vectors=emb,
        ).collect()
    }
    assert len(got & truth) >= 9  # residual PQ + rerank recovers the true top-k
    # the probed scan must touch a small fraction of the corpus
    ranked = sorted(
        (sum((qv[i] - c["centroid"][i]) ** 2 for i in range(64)), c["cell"])
        for c in coarse_rows
    )
    cells = [c for _, c in ranked[:2]]
    assert index.filter(F.col("cell").isin(cells)).count() < 2500


def test_ivfpq_shortlist_only_without_vectors(spark):
    from pyspark.sql import functions as F

    from cascading_hive_spark.operators.similarity import ivfpq_build, ivfpq_search
    from cascading_hive_spark.sources.synthetic import synthetic_embeddings

    emb = synthetic_embeddings(spark, n=1000, dim=64, n_clusters=8).localCheckpoint()
    index, coarse, pqc = ivfpq_build(emb, n_cells=8, m=8, k=16)
    q = emb.filter(F.col("vec_id") == 3).select("embedding").first()["embedding"]
    out = ivfpq_search(
        index, coarse.collect(), pqc.collect(), [float(x) for x in q],
        m=8, nprobe=2, topk=5,
    ).collect()
    assert len(out) == 5
    assert out == sorted(out, key=lambda r: (r.adc_dist, r.vec_id))


def test_ivfpq_disk_index_prunes_partitions(spark, emb, tmp_path):
    """Disk IVF-PQ (the complete 100 TB layout — compressed codes
    partitioned by coarse cell + codebook sidecars): partition pruning
    reaches the CODES scan, and the probe equals the in-memory
    ivfpq_search on the same index."""
    path = str(tmp_path / "ivfpq_idx")
    index, coarse, pqc = S.ivfpq_build(emb, n_cells=16, m=8, k=16)
    S.ivfpq_write(index, coarse, pqc, path)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = S.ivfpq_probe_from_disk(
        spark, path, qv, m=8, nprobe=4, topk=10, shortlist=50, vectors=emb
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    rows = out.collect()
    assert len(rows) == 10
    mem = [
        (r.vec_id, round(r.dist, 9))
        for r in S.ivfpq_search(
            index,
            coarse.collect(),
            pqc.collect(),
            qv,
            m=8,
            nprobe=4,
            topk=10,
            shortlist=50,
            vectors=emb,
        ).collect()
    ]
    assert [(r.vec_id, round(r.dist, 9)) for r in rows] == mem


def test_ivfpq_disk_full_probe_equals_brute_force(spark, emb, tmp_path):
    """nprobe = n_cells + shortlist >= corpus + exact re-rank must
    reproduce brute-force L2 top-k bit-for-bit — the codes only pick
    the shortlist, and the shortlist is everything."""
    path = str(tmp_path / "ivfpq_idx_full")
    index, coarse, pqc = S.ivfpq_build_portable(emb, n_cells=8, m=8, k=16)
    S.ivfpq_write(index, coarse, pqc, path)
    n = emb.count()
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    got = [
        (r.vec_id, round(r.dist, 6))
        for r in S.ivfpq_probe_from_disk(
            spark, path, qv, m=8, nprobe=8, topk=5, shortlist=n, vectors=emb
        ).collect()
    ]
    qlit = F.lit(qv).cast("array<double>")
    brute = (
        emb.select(
            "vec_id",
            F.aggregate(
                F.zip_with("embedding", qlit, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist"),
        )
        .orderBy(F.col("dist").asc(), F.col("vec_id"))
        .limit(5)
        .collect()
    )
    assert got == [(r.vec_id, round(r.dist, 6)) for r in brute]


def test_ivf_append_incremental_vectors_found(spark, emb, tmp_path):
    """Index maintenance: appended vectors are assigned to existing
    cells, land in the partitioned layout, and a from-disk probe finds
    them — without touching the base corpus (increment-sized work)."""
    path = str(tmp_path / "ivf_append_idx")
    base = emb.filter(F.col("vec_id") >= 10)
    assignments, centroids = S.ivf_build(base, n_cells=16)
    S.ivf_write(assignments, centroids, path)
    new = emb.filter(F.col("vec_id") < 10)
    S.ivf_append(spark, path, new)
    stored = spark.read.parquet(f"{path}/vectors")
    assert stored.count() == emb.count()
    # a self-query for an appended vector must hit it at rank 1
    query = emb.filter(F.col("vec_id") == 3).select("embedding")
    top = S.ivf_probe_from_disk(spark, path, query, k=1, nprobe=4).first()
    assert top.vec_id == 3 and top.cos_sim >= 0.999999


def test_ivfpq_append_codes_layout_and_probe(spark, emb, tmp_path):
    """IVF-PQ maintenance: appended vectors are residual-encoded with
    the FROZEN sidecar codebooks, appended into cell partitions, and
    the from-disk probe (exact re-rank) finds an appended vector."""
    path = str(tmp_path / "ivfpq_append_idx")
    base = emb.filter(F.col("vec_id") >= 10)
    index, coarse, pqc = S.ivfpq_build_portable(base, n_cells=8, m=8, k=16)
    S.ivfpq_write(index, coarse, pqc, path)
    new = emb.filter(F.col("vec_id") < 10)
    S.ivfpq_append(spark, path, new, m=8)
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.count() == emb.count()
    assert codes.filter(F.col("vec_id") < 10).count() == 10
    # codes schema unchanged: m ints per row
    row = codes.filter(F.col("vec_id") == 3).first()
    assert len(row["codes"]) == 8
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    hits = S.ivfpq_probe_from_disk(
        spark, path, qv, m=8, nprobe=8, topk=5, shortlist=emb.count(), vectors=emb
    ).collect()
    assert hits[0].vec_id == 3 and hits[0].dist <= 1e-9


def test_ivf_append_empty_increment_is_noop(spark, emb, tmp_path):
    """An empty daily arrival is legitimate: appending zero vectors
    must not crash in _dim_of/.first() (ADVICE r8) and must leave the
    on-disk index byte-identical in content."""
    path = str(tmp_path / "ivf_empty_idx")
    assignments, centroids = S.ivf_build(emb, n_cells=8)
    S.ivf_write(assignments, centroids, path)
    before = spark.read.parquet(f"{path}/vectors").count()
    S.ivf_append(spark, path, emb.filter(F.col("vec_id") < 0))
    assert spark.read.parquet(f"{path}/vectors").count() == before


def test_ivfpq_append_empty_increment_is_noop(spark, emb, tmp_path):
    path = str(tmp_path / "ivfpq_empty_idx")
    index, coarse, pqc = S.ivfpq_build_portable(emb, n_cells=8, m=8, k=16)
    S.ivfpq_write(index, coarse, pqc, path)
    before = spark.read.parquet(f"{path}/codes").count()
    S.ivfpq_append(spark, path, emb.filter(F.col("vec_id") < 0), m=8)
    assert spark.read.parquet(f"{path}/codes").count() == before


def test_kmeans_fit_separates_planted_blobs(spark):
    """Two tight, well-separated 2-D blobs with k=2: after 2 Lloyd
    rounds each trained centroid must sit inside one blob (hash
    seeding mixes the blobs; the E/M rounds must unmix them), and the
    cluster sizes must equal the blob sizes."""
    pts = [(i, [float(10 + (i % 3)), float(10 - (i % 3))]) for i in range(30)]
    pts += [(100 + i, [float(-10 - (i % 3)), float(-10 + (i % 3))]) for i in range(20)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cent = S.kmeans_fit(df, k=2, iters=2)
    rows = cent.collect()
    assert {r.dim for r in rows} == {0, 1}
    by_cid = {}
    for r in rows:
        by_cid.setdefault(r.cid, {})[r.dim] = (r.n, r.centroid)
    assert len(by_cid) == 2
    sizes = sorted(v[0][0] for v in by_cid.values())
    assert sizes == [20, 30]
    for dims in by_cid.values():
        x = dims[0][1]
        assert abs(abs(x) - 11) < 1.5, dims  # blob means are ±(11, 9)-ish


def test_kmeans_fit_empty_cluster_keeps_prior_centroid(spark):
    """k far above the distinct-point count: clusters that lose every
    member must survive with n=0 and their previous centroid (the
    portable no-reseed contract), and occupied clusters must carry the
    full population."""
    pts = [(i, [0.0, 0.0]) for i in range(8)]  # all identical points
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cent = S.kmeans_fit(df, k=4, iters=2)
    rows = cent.collect()
    per_cid = {}
    for r in rows:
        per_cid.setdefault(r.cid, []).append(r)
    # every point lands on ONE cid (ties to the lowest cid among those
    # at distance 0 from (0,0) — all centroids equal the origin)
    ns = sorted({rs[0].n for rs in per_cid.values()}, reverse=True)
    assert ns[0] == 8 and all(n == 0 for n in ns[1:])
    for rs in per_cid.values():
        for r in rs:
            assert r.centroid == 0.0  # retained prior == origin


def test_ivf_build_from_kmeans_roundtrip(spark, emb, tmp_path):
    """Trained-cell IVF: kmeans_fit centroids lift into cell arrays,
    assignments cover every vector exactly once, the index survives
    ivf_write -> ivf_probe_from_disk, and a full-probe search finds
    the query vector itself at distance ~0."""
    path = str(tmp_path / "ivf_kmeans_idx")
    assignments, cents = S.ivf_build_from_kmeans(emb, k=8, iters=1)
    assert assignments.count() == emb.count()
    assert assignments.select("vec_id").distinct().count() == emb.count()
    crows = cents.collect()
    assert len(crows) == 8
    dim = len(emb.first()["embedding"])
    assert all(len(r.centroid) == dim for r in crows)
    S.ivf_write(assignments, cents, path)
    query = emb.filter(F.col("vec_id") == 5).select("embedding")
    hits = S.ivf_probe_from_disk(spark, path, query, k=3, nprobe=8)
    top = hits.collect()[0]
    assert top.vec_id == 5 and abs(top.cos_sim - 1.0) < 1e-6


def test_cell_distances_fold_matches_exploded_image(spark, sf_dir):
    """The E-step's array-fold d2 must equal the exploded
    join-on-dim decimal image BIT FOR BIT — not merely produce the
    same argmin. Pins the Spark decimal-add precision trap: at
    (38,9)+(38,9) Spark silently reduces the scale to 8, which keeps
    assignments stable but shifts raw distances (caught by the
    inertia oracle in r10)."""
    from cascading_hive_spark.operators.similarity import (
        cell_distances,
        kmeans_fit,
    )
    from cascading_hive_spark.tables import load_table

    v = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(v, k=4, iters=1).localCheckpoint()
    base = v.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").cast("array<double>").alias("_v"),
    )
    fold = {(r._id, r._ccid): r._d2 for r in cell_distances(base, cents).collect()}
    cent = cents.select(
        F.col("cid").alias("_ccid"), "dim", F.col("centroid").alias("_cval")
    )
    ex = base.select("_id", F.posexplode("_v").alias("dim", "_val"))
    diff = F.col("_val") - F.col("_cval")
    exploded = {
        (r._id, r._ccid): r._d2
        for r in (
            ex.join(F.broadcast(cent), "dim")
            .groupBy("_id", "_ccid")
            .agg(F.sum(F.round(diff * diff, 9).cast("decimal(38,9)")).alias("_d2"))
        ).collect()
    }
    assert set(fold) == set(exploded)
    for k_ in fold:
        assert fold[k_] == exploded[k_], (k_, fold[k_], exploded[k_])


def test_covariance_and_pca_match_numpy(spark):
    """covariance_matrix_embeddings == np.cov(bias=True) to the decimal
    image; pca_components/pca_project == a full numpy PCA replay
    (eigh on the population covariance, same sign fix) to 1e-6; the
    planted dominant direction lands in pc1."""
    import numpy as np

    from cascading_hive_spark.operators.similarity import (
        covariance_matrix_embeddings,
        pca_components,
        pca_project,
    )

    rng = np.random.default_rng(23)
    d, n_rows = 6, 300
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    base = rng.normal(size=(n_rows, d))
    mat = base + np.outer(rng.normal(0, 5, n_rows), direction)  # dominant axis
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n_rows)],
        "vec_id long, embedding array<double>",
    )
    # covariance vs numpy population covariance
    got = {(r.dim_a, r.dim_b): r.cov
           for r in covariance_matrix_embeddings(df).collect()}
    want = np.cov(mat.T, bias=True)
    assert len(got) == d * (d + 1) // 2
    for (i, j), c in got.items():
        assert i <= j
        assert abs(c - want[i, j]) < 1e-5, (i, j, c, want[i, j])
    # pca: components match a numpy replay with the same sign fix
    means, comps = pca_components(df, k=2)
    assert np.allclose(means, mat.mean(axis=0), atol=1e-9)
    evals, evecs = np.linalg.eigh(want)
    for rank, idx in enumerate(np.argsort(evals)[::-1][:2]):
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        assert np.allclose(comps[rank], v, atol=1e-6), rank
    # pc1 is the planted direction (up to sign already fixed)
    assert abs(abs(np.dot(comps[0], direction)) - 1.0) < 0.05
    # projection matches numpy
    proj = {r.vec_id: (r.pc1, r.pc2) for r in
            pca_project(df, means, comps).collect()}
    wantp = np.round((mat - mat.mean(axis=0)) @ np.asarray(comps).T, 4)
    for i in range(n_rows):
        assert abs(proj[i][0] - wantp[i, 0]) < 1e-3
        assert abs(proj[i][1] - wantp[i, 1]) < 1e-3
    # guards
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be"):
        pca_components(df, k=0)


def test_pq_rerank_recall_gate_fixed_seeds(spark, emb):
    """PQ-rerank recall floor at the deterministic fixed-seed build
    (VERDICT r12 #5): ADC alone cannot resolve below quantization
    noise on this random-vector worst case (measured 0.1 recall), the
    shortlist=200 exact re-rank recovers 0.9 — gate the deployed
    composition at >= 0.9 and the rerank's advantage over raw ADC."""
    from pyspark.sql import functions as F

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding]
    qlit = F.lit(qv).cast("array<double>")
    d2 = F.aggregate(
        F.zip_with(F.col("embedding"), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    truth = {
        r.vec_id
        for r in emb.select("vec_id", d2.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    cent = S.pq_train(emb, m=8, k=16)
    codes = S.pq_encode(emb, cent, m=8)
    crows = cent.collect()
    rerank = {
        r.vec_id
        for r in S.pq_search_rerank(
            codes, emb, crows, qv, m=8, topk=10, shortlist=200
        ).collect()
    }
    adc = {r.vec_id for r in S.pq_search(codes, crows, qv, m=8, topk=10).collect()}
    rerank_recall = len(rerank & truth) / len(truth)
    adc_recall = len(adc & truth) / len(truth)
    assert rerank_recall >= 0.9, f"PQ rerank recall {rerank_recall}"
    assert rerank_recall > adc_recall, (rerank_recall, adc_recall)
    # the self vector survives the whole compressed pipeline
    assert 0 in rerank


def test_knn_density_matches_numpy(spark, emb):
    """Exact kNN-density vs a numpy replay of the same definition
    (top-k by 6dp-rounded cosine, ties by neighbor id, mean)."""
    import numpy as np

    rows = emb.filter(F.col("vec_id") < 40).collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    cos = np.round((mat @ mat.T) / np.outer(nrm, nrm), 6)
    k = 5
    expected = {}
    for i in range(len(ids)):
        others = [(cos[i, j], -int(ids[j])) for j in range(len(ids)) if j != i]
        # sort by cos desc, then neighbor id asc
        top = sorted(others, key=lambda t: (-t[0], -t[1]))[:k]
        expected[int(ids[i])] = sum(t[0] for t in top) / k
    got = {
        r.vec_id: r.knn_density
        for r in S.knn_density(
            emb.filter(F.col("vec_id") < 40), k=k
        ).collect()
    }
    assert set(got) == set(expected)
    for vid, d in expected.items():
        assert abs(got[vid] - d) < 1e-6, (vid, got[vid], d)


def test_knn_density_full_probe_equals_exact(spark, emb):
    """nprobe = n_cells degenerates the blocked path to brute force:
    every cell is probed, so the candidate set is the full corpus and
    the densities must match the exact path bit-for-bit."""
    sub = emb.filter(F.col("vec_id") < 120)
    exact = {r.vec_id: r.knn_density for r in S.knn_density(sub, k=5).collect()}
    assignments, centroids = S.ivf_build_portable(sub, n_cells=4)
    blocked = {
        r.vec_id: r.knn_density
        for r in S.knn_density_blocked(
            assignments, centroids, k=5, nprobe=4
        ).collect()
    }
    assert blocked == exact


def test_knn_density_blocked_rank_agreement(spark, emb):
    """Partial probe is approximate (unprobed-cell neighbors unseen
    bias density down), but the PRUNE DECISION — which vectors are
    densest — must agree with the exact ranking: gate the top-decile
    overlap. The sf0.001 embeddings are only weakly clustered (the
    hardest case for IVF blocking — neighbors scatter across cells),
    measured overlap 0.46 @ nprobe=2/8, 0.74 @ 4/8, 0.86 @ 6/8; gate
    4/8 at 0.6 so only a real blocking regression trips. (Lloyd
    ``ivf_build`` here: the portable build's hash-seeded cells are
    deliberately geometry-free, fine for replay parity but the wrong
    index for a recall measurement.)"""
    exact = S.knn_density(emb, k=5).collect()
    assignments, centroids = S.ivf_build(emb, n_cells=8)
    blocked = S.knn_density_blocked(assignments, centroids, k=5, nprobe=4).collect()
    n_top = max(10, len(exact) // 10)
    top_exact = {
        r.vec_id
        for r in sorted(exact, key=lambda r: (-r.knn_density, r.vec_id))[:n_top]
    }
    top_blocked = {
        r.vec_id
        for r in sorted(blocked, key=lambda r: (-r.knn_density, r.vec_id))[:n_top]
    }
    overlap = len(top_exact & top_blocked) / n_top
    assert overlap >= 0.6, f"top-decile overlap {overlap}"
    # density is never overestimated by partial probing: the blocked
    # candidate set is a subset of the exact one
    bd = {r.vec_id: r.knn_density for r in blocked}
    for r in exact:
        assert bd[r.vec_id] <= r.knn_density + 1e-9


def test_knn_density_small_corpus_short_neighbors(spark):
    """Corpus smaller than k+1: every vector still gets a row, with
    n_neighbors = n - 1 (self excluded), not an error."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = S.knn_density(df, k=10).collect()
    assert len(out) == 3
    assert all(r.n_neighbors == 2 for r in out)


def test_pca_power_project_matches_eigensolve_direction(spark):
    """pca_power_project (8 portable power rounds) must agree with the
    numpy-eigh path (pca_components/pca_project, k=1) up to the
    rounding grid on data with a dominant component: correlation of
    the two projections ~ +-1 (power iteration converges fast when the
    eigengap is wide)."""
    import numpy as np

    from cascading_hive_spark.operators.similarity import (
        pca_components,
        pca_power_project,
        pca_project,
    )

    rng_like = [
        (i, [float(((i * 37 + j * 11) % 19) - 9) / 10.0
             + (3.0 if j == 2 else 0.0) * (1.0 if i % 2 == 0 else -1.0)
             for j in range(6)])
        for i in range(80)
    ]
    df = spark.createDataFrame(rng_like, "vec_id long, embedding array<double>")
    power = {r.vec_id: r.pc1 for r in pca_power_project(df).collect()}
    means, comps = pca_components(df, k=1)
    eigh = {
        r.vec_id: r.pc1
        for r in pca_project(df, means, comps).select("vec_id", "pc1").collect()
    }
    a = np.array([power[i] for i in sorted(power)])
    b = np.array([eigh[i] for i in sorted(eigh)])
    corr = float(np.corrcoef(a, b)[0, 1])
    assert abs(corr) > 0.999, corr


def test_pca_power_project_deterministic_and_sign_fixed(spark):
    """Two runs over different partitionings must be bit-identical
    (the bigint micro-unit contract), and the component sign is fixed
    (dim-0 coordinate >= 0) so projections never flip run to run."""
    from cascading_hive_spark.operators.similarity import pca_power_project

    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 7.0 for j in range(5)])
        for i in range(40)
    ]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df2 = df1.repartition(13)
    got1 = sorted((r.vec_id, r.pc1) for r in pca_power_project(df1).collect())
    got2 = sorted((r.vec_id, r.pc1) for r in pca_power_project(df2).collect())
    assert got1 == got2


def test_pca_power_project_steps_guard(spark):
    import pytest

    from cascading_hive_spark.operators.similarity import pca_power_project

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="steps"):
        pca_power_project(df, steps=0)


def test_knn_density_blocked_tie_heavy_full_probe(spark):
    """r13 ADVICE: rounded-similarity ties past the candidate cut must
    not break parity — a corpus dominated by identical vectors (every
    neighbor ties at cos=1.0) under FULL probe must equal the exact
    path bit-for-bit."""
    from cascading_hive_spark.operators.similarity import (
        ivf_build_portable,
        knn_density,
        knn_density_blocked,
    )

    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(30)]  # all tied
    rows += [(100 + i, [float(i + 1), 1.0, 0.5, 2.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assignments, centroids = ivf_build_portable(df, n_cells=2)
    blocked = {
        (r.vec_id, r.knn_density, r.n_neighbors)
        for r in knn_density_blocked(
            assignments, centroids, k=10, nprobe=2
        ).collect()
    }
    exact = {
        (r.vec_id, r.knn_density, r.n_neighbors)
        for r in knn_density(df, k=10).collect()
    }
    assert blocked == exact
