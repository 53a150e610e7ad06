"""Synthetic source determinism + dedup recall at generated scale, and
the SQL function library."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascading_hive_spark.functions import install_sql_functions
from cascading_hive_spark.sources import synthetic_documents, synthetic_embeddings


def test_synthetic_documents_deterministic(spark):
    a = synthetic_documents(spark, n=500, partitions=4).collect()
    b = synthetic_documents(spark, n=500, partitions=13).collect()  # different split
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_minhash_recovers_planted_dups_at_20k(spark):
    docs = synthetic_documents(spark, n=20_000, dup_rate=0.02)
    from cascading_hive_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    # every planted dup copies all but one of 60 tokens from its source
    # -> jaccard >> 0.8; expect roughly dup_rate * n pairs found
    assert len(pairs) >= 0.015 * 20_000, len(pairs)
    assert all(r.jaccard >= 0.8 for r in pairs)


def test_synthetic_embeddings_cluster_structure(spark):
    emb = synthetic_embeddings(spark, n=2000, n_clusters=5)
    from cascading_hive_spark.operators.similarity import cosine

    a = emb.select(F.col("vec_id").alias("ia"), F.col("label").alias("la"),
                   F.col("embedding").alias("va")).filter(F.col("ia") < 100)
    b = emb.select(F.col("vec_id").alias("ib"), F.col("label").alias("lb"),
                   F.col("embedding").alias("vb")).filter(F.col("ib") < 100)
    pairs = a.crossJoin(b).filter(F.col("ia") < F.col("ib")).select(
        (F.col("la") == F.col("lb")).alias("same"),
        cosine(F.col("va"), F.col("vb")).alias("c"),
    )
    stats = pairs.groupBy("same").agg(F.avg("c").alias("m")).collect()
    by = {r.same: r.m for r in stats}
    assert by[True] > by[False] + 0.2  # same-cluster pairs markedly closer


def test_sql_function_library(spark, sf_dir):
    installed = install_sql_functions(spark)
    assert "vec_cosine" in installed
    from cascading_hive_spark.tables import register_views

    register_views(spark, sf_dir)
    row = spark.sql(
        """
        SELECT vec_cosine(a.embedding, a.embedding) AS self_cos,
               arr_jaccard(array('a','b'), array('b','c')) AS j,
               ws_tokens('one two  three') AS nt,
               punct_ratio('ab,cd!') AS pr,
               doc_fingerprint('b a a') AS fp1,
               doc_fingerprint('a b') AS fp2
        FROM embeddings a WHERE vec_id = 0
        """
    ).collect()[0]
    assert abs(row.self_cos - 1.0) < 1e-12
    assert abs(row.j - 1.0 / 3.0) < 1e-12
    assert row.nt == 3
    assert abs(row.pr - 2.0 / 6.0) < 1e-12
    assert row.fp1 == row.fp2  # order/dup-insensitive fingerprint
    # idempotent re-install
    install_sql_functions(spark)


def test_sql_cosine_matches_dataframe_cosine(spark, sf_dir):
    install_sql_functions(spark)
    from cascading_hive_spark.operators.similarity import cosine
    from cascading_hive_spark.tables import load_table, register_views

    register_views(spark, sf_dir)
    via_sql = spark.sql(
        """
        SELECT a.vec_id, vec_cosine(a.embedding, b.embedding) AS c
        FROM embeddings a JOIN embeddings b ON b.vec_id = 0
        WHERE a.vec_id < 50
        """
    ).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    via_df = (
        emb.filter(F.col("vec_id") < 50)
        .crossJoin(q)
        .select("vec_id", cosine(F.col("embedding"), F.col("qv")).alias("c"))
        .collect()
    )
    a = {r.vec_id: r.c for r in via_sql}
    b = {r.vec_id: r.c for r in via_df}
    assert a == b  # bitwise identical — same expression both surfaces


def test_chunk_documents_reconstructs_text(spark):
    """Chunks with the overlap trimmed concatenate back to the original
    text; boundaries honor chunk/overlap arithmetic."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from cascading_hive_spark.operators.text import chunk_documents

    txt = "".join(chr(97 + i % 26) for i in range(1000))
    df = spark.createDataFrame([(1, txt), (2, ""), (3, "short")], "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_chars=300, overlap=50).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts at 1, 251, 501, 751 (step 250)
    starts = sorted(r.start for r in by_doc[1])
    assert starts == [1, 251, 501, 751]
    chunks = {r.start: r.chunk_text for r in by_doc[1]}
    assert all(len(chunks[s]) == 300 for s in starts[:-1])
    # reconstruct: first chunk + non-overlap tail of each later chunk
    rebuilt = chunks[1] + "".join(chunks[s][50:] for s in starts[1:])
    assert rebuilt == txt
    # empty and short docs: exactly one chunk each
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == ""
    assert len(by_doc[3]) == 1 and by_doc[3][0].chunk_text == "short"
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", chunk_chars=100, overlap=100)


def test_decontaminate_planted_overlap(spark):
    """A train doc embedding a full 8-gram from the eval set is
    flagged with the right distinct-gram count; disjoint docs come out
    clean but present; short docs fall back to the whole-text gram."""
    from pyspark.sql import functions as F

    from cascading_hive_spark.operators.text import decontaminate

    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains the eval doc's full text -> shares its 8-gram
            (1, "prefix alpha beta gamma delta epsilon zeta eta theta suffix"),
            # disjoint vocabulary -> clean
            (2, "one two three four five six seven eight nine ten"),
            # shorter than n tokens -> whole-text gram, no overlap
            (3, "alpha beta"),
            # NULL text is dropped entirely
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decontaminate(train, eval_df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].contaminated and rows[1].n_contaminated == 1
    assert not rows[2].contaminated and rows[2].n_contaminated == 0
    assert not rows[3].contaminated
