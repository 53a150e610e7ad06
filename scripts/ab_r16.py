"""Same-JVM A/B timing for the r16 optimization round.

For each optimized operator, reconstructs the PRE-optimization
formulation inline (copied from the r15 HEAD) and times old vs new
back-to-back in one session (noop sink, alternating runs, median-of-3
each) — host-noise-robust relative evidence for OPTIMIZATION_r16.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cascading_hive_spark import queries as Q
from cascading_hive_spark.session import get_session
from cascading_hive_spark.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _t(spark, name):
    return load_table(spark, SF_DIR, name)


# ---------------- old formulations (r15 HEAD copies) ----------------


def old_pagerank_portable(edges, src="src", dst="dst", damping=0.85, iterations=5):
    def dec_sum(col):
        return F.sum(F.round(col, 12).cast("decimal(38,12)")).cast("double")

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).dropDuplicates(
        ["u", "v"]
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_total = nodes.agg(F.count(F.lit(1)).alias("_n"))
    out_deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("_deg")).localCheckpoint()
    dangling_nodes = nodes.join(
        out_deg, nodes.node == out_deg.u, "left_anti"
    ).localCheckpoint()
    ranks = nodes.crossJoin(F.broadcast(n_total)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for i in range(iterations):
        dangling = ranks.join(dangling_nodes, "node", "left_semi").agg(
            F.coalesce(dec_sum(F.col("rank")), F.lit(0.0)).alias("_dm")
        )
        contribs = (
            e.join(ranks.join(out_deg, ranks.node == out_deg.u), e.u == F.col("node"))
            .select(F.col("v").alias("node"), (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("node")
            .agg(dec_sum(F.col("_c")).alias("_sum"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n_total))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("_n")
                    + damping
                    * (F.coalesce(F.col("_sum"), F.lit(0.0)) + F.col("_dm") / F.col("_n"))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def old_label_propagation(edges, src="src", dst="dst", iterations=3, checkpoint_every=2):
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .dropDuplicates(["u", "v"])
        .filter(F.col("u") != F.col("v"))
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    w = Window.partitionBy("node").orderBy(F.col("_cnt").desc(), F.col("label"))
    for i in range(iterations):
        votes = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy(sym["u"].alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        labels = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            labels = labels.localCheckpoint(eager=False)
    return labels.select("node", F.col("label").alias("community"))


def old_assign_cells(vectors, centroids, id_col, vec_col):
    from cascading_hive_spark.operators.similarity import cosine

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


def old_semantic_sided(vectors, centroids, id_col="vec_id", vec_col="embedding"):
    from cascading_hive_spark.operators.similarity import argmin_cell, cell_distances

    base = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    assigned = argmin_cell(cell_distances(base, centroids, 9))
    return base.join(assigned, "_id").select("cid", "_id", "_v")


def old_charspan_islands(docs, id_col, text_col, min_len, stride):
    from cascading_hive_spark.operators.dedup import spread

    base = spread(docs).select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        F.length(text_col).alias("_nc"),
    )
    grams = (
        base.filter(F.col("_nc") >= min_len)
        .select(
            "_id",
            F.explode(
                F.sequence(F.lit(1), F.col("_nc") - (min_len - 1), F.lit(stride))
            ).alias("_p"),
            "_txt",
        )
        .select(
            "_id",
            "_p",
            F.md5(F.col("_txt").substr(F.col("_p"), F.lit(min_len))).alias("_g"),
        )
    )
    dup = (
        grams.groupBy("_g")
        .agg(F.count_distinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("_g")
    )
    spans = grams.join(dup, "_g").select(
        "_id", F.col("_p").alias("_s"), (F.col("_p") + (min_len - 1)).alias("_e")
    )
    w_prev = (
        Window.partitionBy("_id").orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy("_id").orderBy("_s")
    return (
        spans.withColumn(
            "_new",
            (F.col("_s") > F.coalesce(F.max("_e").over(w_prev), F.lit(-1)) + 1).cast("int"),
        )
        .withColumn("_isl", F.sum("_new").over(w_run))
        .groupBy("_id", "_isl")
        .agg(F.min("_s").alias("_s"), F.max("_e").alias("_e"))
        .select("_id", "_s", "_e")
    )


def old_charspan_scrub(docs, id_col, text_col, min_len=50, stride=1, out_col="clean_text"):
    # remove_duplicate_charspans body over the OLD island core
    islands = (
        old_charspan_islands(docs, id_col, text_col, min_len, stride)
        .groupBy("_id")
        .agg(
            F.collect_list(F.struct(F.col("_s").alias("s"), F.col("_e").alias("e"))).alias(
                "_ivs"
            )
        )
    )
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        F.length(text_col).alias("_nc"),
    )
    joined = base.join(islands, "_id", "left").withColumn(
        "_ivs2", F.coalesce(F.col("_ivs"), F.array().cast("array<struct<s:int,e:int>>"))
    )
    # scrub: keep chars outside islands (mirror of remove_duplicate_charspans)
    kept = F.filter(
        F.transform(
            F.split(F.col("_txt"), ""),
            lambda ch, i: F.struct(ch.alias("c"), (i + F.lit(1)).alias("p")),
        ),
        lambda st: ~F.exists(
            F.col("_ivs2"), lambda iv: (st["p"] >= iv["s"]) & (st["p"] <= iv["e"])
        ),
    )
    return joined.select(
        F.col("_id").alias(id_col),
        F.col("_nc").cast("bigint").alias("n_chars"),
        F.size(kept).cast("bigint").alias("kept_chars"),
        F.concat_ws("", F.transform(kept, lambda st: st["c"])).alias(out_col),
    )


def old_dsir_select(spark):
    from cascading_hive_spark.operators.corpus import (
        dsir_gumbel_topk,
        dsir_weights,
    )

    d = _t(spark, "documents")
    w = dsir_weights(d, d.filter(F.col("lang") == "en"), "text")
    return _old_dsir_score_then_topk(d, w)


def _old_dsir_score_then_topk(d, w):
    # old dsir_score: buckets expression referenced twice in ONE projection
    from cascading_hive_spark.operators.corpus import dsir_gumbel_topk
    from cascading_hive_spark.operators.dedup import spread
    from cascading_hive_spark.operators.text import char_ngram_buckets

    nb = len(w)
    w_arr = F.array(*[F.lit(int(round(x * 1_000_000))).cast("bigint") for x in w])
    buckets = char_ngram_buckets(F.col("text"), 3, nb, "dsir13|", True)
    micro = F.aggregate(
        buckets,
        F.lit(0).cast("bigint"),
        lambda acc, b: acc + F.element_at(w_arr, b.cast("int") + 1),
    )
    scored = spread(d).select(
        F.col("doc_id"),
        F.size(buckets).cast("bigint").alias("n_grams"),
        (F.round(micro.cast("double") / F.lit(1_000_000.0), 6) + F.lit(0.0)).alias(
            "dsir_logratio"
        ),
    )
    return dsir_gumbel_topk(scored, "doc_id", k=50)


def old_funnel(spark):
    from cascading_hive_spark.operators.corpus import gopher_quality_rules
    from cascading_hive_spark.operators.sampling import cap_per_key
    from cascading_hive_spark.operators.text import (
        lang_id_scores,
        quality_classifier_score,
    )

    d = _t(spark, "documents")
    g = gopher_quality_rules(d, "doc_id", "text").select(
        "doc_id",
        (
            F.col("word_count_ok")
            & F.col("word_len_ok")
            & F.col("symbol_ok")
            & F.col("bullet_ok")
            & F.col("ellipsis_ok")
        ).alias("g"),
    )
    lid = lang_id_scores(
        d, "doc_id", "text", Q._LID_MODELS_V1, n=3, seed="lid14|", widen=False
    ).select("doc_id", "pred_lang")
    c = quality_classifier_score(
        d, "doc_id", "text", Q._QC_WEIGHTS_V1, Q._QC_BIAS_V1
    ).select("doc_id", F.col("quality_pass").alias("c"))
    flags = (
        d.select("doc_id", "source")
        .join(g, "doc_id")
        .join(lid, "doc_id")
        .join(c, "doc_id")
        .localCheckpoint()
    )
    top = (
        flags.filter(F.col("g"))
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .agg(
            F.min_by(
                "pred_lang",
                F.struct((-F.col("_cnt")).alias("nc"), F.col("pred_lang")),
            ).alias("_top")
        )
    )
    flags = flags.join(F.broadcast(top)).withColumn(
        "l", F.col("pred_lang") == F.col("_top")
    )
    s2 = flags.filter(F.col("g") & F.col("l") & F.col("c")).select(
        "doc_id",
        F.concat(
            F.col("source"), F.lit("-"), F.pmod(F.col("doc_id"), F.lit(3)).cast("string")
        ).alias("domain"),
    )
    capped = cap_per_key(s2, "domain", "doc_id", cap=4).select(
        "doc_id", F.lit(1).alias("_k")
    )
    return flags.join(capped, "doc_id", "left").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.coalesce(F.sum(F.col("g").cast("long")), F.lit(0)).cast("bigint").alias("n_gopher"),
        F.coalesce(F.sum((F.col("g") & F.col("l")).cast("long")), F.lit(0))
        .cast("bigint")
        .alias("n_lang"),
        F.coalesce(
            F.sum((F.col("g") & F.col("l") & F.col("c")).cast("long")), F.lit(0)
        )
        .cast("bigint")
        .alias("n_classifier"),
        F.coalesce(F.sum(F.coalesce(F.col("_k"), F.lit(0))), F.lit(0))
        .cast("bigint")
        .alias("n_domain_cap"),
    )


# ---------------- pair builders ----------------


def build_pairs(spark):
    from cascading_hive_spark.operators.dedup import semantic_dedup_pairs
    from cascading_hive_spark.operators.graph import label_propagation, pagerank_portable
    from cascading_hive_spark.operators.similarity import (
        ivf_build_portable,
        kmeans_fit,
        knn_density_blocked,
    )

    qs = Q.queries()

    def hub_edges():
        c = _t(spark, "customer").select("c_custkey", "c_nationkey")
        w_ring = Window.partitionBy("c_nationkey").orderBy("c_custkey")
        ring = c.select(
            F.col("c_custkey").alias("src"), F.lead("c_custkey").over(w_ring).alias("dst")
        )
        hub = c.select(
            F.col("c_custkey").alias("src"),
            F.min("c_custkey").over(Window.partitionBy("c_nationkey")).alias("dst"),
        )
        return ring.unionByName(hub).filter(
            F.col("dst").isNotNull() & (F.col("src") != F.col("dst"))
        )

    def lpa_edges():
        # mirror q_graph_label_propagation's edge builder
        o = _t(spark, "orders").select("o_custkey", "o_orderkey")
        return o.select(
            F.col("o_custkey").alias("src"),
            F.pmod(F.col("o_orderkey"), F.lit(1500)).alias("dst"),
        )

    def sem_old():
        e = _t(spark, "embeddings")
        from cascading_hive_spark.operators.dedup import semantic_dedup_pairs as sdp

        # old = old assignment + current cell task; rebuild by monkey core
        cents = kmeans_fit(e, k=8, iters=2)
        sided = old_semantic_sided(e, cents)
        # reuse the pair task from the current implementation
        import cascading_hive_spark.operators.dedup as DD

        base = e.select(
            F.col("vec_id").alias("_id"), F.col("embedding").cast("array<double>").alias("_v")
        )
        # call current semantic_dedup_pairs but splice old sided: simplest is
        # to time old E-step + join separately from pair task; instead just
        # time the full old pipeline by calling the internal pieces:
        from pyspark.sql.types import DoubleType, LongType, StructField, StructType

        return sided  # timing the E-step+join (the changed part) only

    pairs = []
    pairs.append(
        (
            "pagerank_portable",
            lambda: old_pagerank_portable(hub_edges(), damping=Q._PR_DAMPING,
                                          iterations=Q._PR_ITERATIONS).select(
                "node", F.round("rank", 9).alias("rank")
            ),
            lambda: qs["graph_pagerank_hubs"](spark, SF_DIR),
        )
    )
    pairs.append(
        (
            "label_propagation",
            lambda: old_label_propagation(lpa_edges(), iterations=3),
            lambda: qs["graph_label_propagation"](spark, SF_DIR),
        )
    )
    pairs.append(
        (
            "semantic_estep",
            lambda: old_semantic_sided(
                _t(spark, "embeddings"), kmeans_fit(_t(spark, "embeddings"), k=8, iters=2)
            ),
            lambda: __import__(
                "cascading_hive_spark.operators.similarity", fromlist=["assign_min_cell"]
            ).assign_min_cell(
                _t(spark, "embeddings")
                .select(
                    F.col("vec_id").alias("_id"),
                    F.col("embedding").cast("array<double>").alias("_v"),
                ),
                kmeans_fit(_t(spark, "embeddings"), k=8, iters=2),
                9,
            ).select("cid", "_id", "_v"),
        )
    )
    pairs.append(
        (
            "dedup_semantic_pairs_full",
            None,  # old full pipeline too intrusive; covered by estep + bench
            lambda: qs["dedup_semantic_pairs"](spark, SF_DIR),
        )
    )
    pairs.append(
        (
            "knn_density_blocked",
            lambda: _old_knn_density(spark),
            lambda: qs["embedding_knn_density_blocked"](spark, SF_DIR),
        )
    )
    pairs.append(
        (
            "charspan_scrub",
            lambda: old_charspan_scrub(_t(spark, "documents"), "doc_id", "text"),
            lambda: qs["dedup_charspan_scrub"](spark, SF_DIR),
        )
    )
    pairs.append(
        ("dsir_select", lambda: old_dsir_select(spark), lambda: qs["docs_dsir_select"](spark, SF_DIR))
    )
    pairs.append(
        ("curation_funnel", lambda: old_funnel(spark), lambda: qs["pipeline_curation_funnel"](spark, SF_DIR))
    )
    return pairs


def _old_knn_density(spark):
    from cascading_hive_spark.operators.similarity import (
        _collect_cells,
        cosine,
        ivf_build_portable,
    )
    from pyspark.sql.types import DoubleType, StructField, StructType

    # old: window-based probe selection + old assignment, new cell task
    e = _t(spark, "embeddings")
    # old ivf_build_portable = old _assign_cells; reconstruct:
    from cascading_hive_spark.operators.sampling import hash_order

    dim = len(e.select("embedding").first()["embedding"])
    seeded = e.select(
        F.col("vec_id"),
        F.col("embedding"),
        F.pmod(hash_order(F.col("vec_id")), F.lit(Q._IVFP_CELLS)).alias("cell"),
    )
    sums = seeded.groupBy("cell").agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(
                F.round(F.get(F.col("embedding"), i).cast("double"), 6).cast("decimal(18,6)")
            ).alias(f"_s{i}")
            for i in range(dim)
        ],
    )
    centroids = sums.select(
        "cell",
        F.array(*[(F.col(f"_s{i}").cast("double") / F.col("_n")) for i in range(dim)]).alias(
            "centroid"
        ),
    ).localCheckpoint()
    assignments = old_assign_cells(e, centroids, "vec_id", "embedding")
    # old probe selection (window) + current cogroup task via knn_density_blocked's
    # internals is awkward; approximate old by window probes + current task:
    import cascading_hive_spark.operators.similarity as S

    q0 = assignments.select(F.col("vec_id").alias("_qid"), F.col("embedding").alias("_qv"))
    cscored = q0.crossJoin(F.broadcast(centroids)).select(
        "_qid", "_qv", "cell", cosine(F.col("_qv"), F.col("centroid")).alias("_csim")
    )
    wq = Window.partitionBy("_qid").orderBy(F.col("_csim").desc(), F.col("cell"))
    probes = (
        cscored.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= Q._IVFP_NPROBE)
        .select("_qid", "_qv", "cell")
    )
    # splice into the current implementation's cogroup path by calling
    # knn_density_blocked with monkeypatched _top_cells? Simplest: time the
    # selection+assignment stages only via a count-ish noop of probes+assignments
    return probes.join(
        assignments.select("cell", F.col("vec_id").alias("_mid")), "cell"
    ).groupBy("_qid").agg(F.count(F.lit(1)).alias("n_cand"))


def main() -> int:
    spark = get_session("ab_r16")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    def control():
        t0 = time.monotonic()
        spark.range(150_000_000).selectExpr("sum(id * 2654435761 % 1000) AS s").collect()
        return time.monotonic() - t0

    ctl = sorted(control() for _ in range(3))[1]
    print(f"control_agg: {ctl:.3f}s", flush=True)

    names = sys.argv[1:]
    for name, old_fn, new_fn in build_pairs(spark):
        if names and name not in names:
            continue
        if old_fn is None:
            continue
        olds, news = [], []
        # untimed warmup of both
        for fn in (old_fn, new_fn):
            try:
                fn().write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: FAILED {exc!r}", flush=True)
                break
        else:
            for _ in range(3):
                for fn, acc in ((old_fn, olds), (new_fn, news)):
                    t0 = time.monotonic()
                    fn().write.format("noop").mode("overwrite").save()
                    acc.append(time.monotonic() - t0)
            mo = sorted(olds)[1]
            mn = sorted(news)[1]
            print(
                f"{name}: old median {mo:.3f}s {[round(x,2) for x in olds]} | "
                f"new median {mn:.3f}s {[round(x,2) for x in news]} | "
                f"ratio {mn/mo:.2f}",
                flush=True,
            )
    print(f"control_agg end: {sorted(control() for _ in range(3))[1]:.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
