"""Distributed deterministic synthetic corpora.

Generation is pure Catalyst expressions over ``spark.range`` —
xxhash64 of (id, seed) drives all pseudo-randomness, so the output is
identical for a given (n, seed) regardless of partitioning or cluster
size, with NO driver-side data and no Python in the row loop. Built to
stress-test dedup/similarity at sizes the fixed test data doesn't
reach (millions of rows is a one-arg change).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_VOCAB = (
    "spark table query join scan filter agg merge sort window hash batch "
    "stream row column vector key value data part order line customer the a "
    "small big fast slow dup group"
).split()


def _u01(*cols: Column) -> Column:
    """Deterministic uniform [0,1) from hashed inputs."""
    h = F.xxhash64(*cols)
    return (F.abs(h) % F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def synthetic_documents(
    spark: SparkSession,
    n: int = 100_000,
    seed: int = 42,
    dup_rate: float = 0.05,
    n_tokens: int = 60,
    n_vocab: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Word-salad documents with a planted near-duplicate fraction.

    A ``dup_rate`` share of docs copy the token stream of an earlier
    doc (id - 1..16) with the last token perturbed — guaranteed
    high-Jaccard pairs for dedup recall tests. Columns match the
    driver's documents table (doc_id, text, lang, source, n_chars).

    ``n_vocab``: vocabulary size. The default 30-word vocabulary reads
    naturally but makes LSH bands non-discriminative past ~100k docs
    (min-hashes over a tiny shingle space concentrate, and the
    max_bucket skew guard then drops the flooded buckets — by design).
    For large-n dedup recall tests pass n_vocab >= ~5000 to emulate a
    real corpus vocabulary.
    """
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    if n_vocab is None:
        n_vocab = len(_VOCAB)
    if n_vocab <= len(_VOCAB):
        # honor small vocabularies (collision stress tests) by slicing
        vocab = F.array(*[F.lit(w) for w in _VOCAB[:n_vocab]])
    else:
        vocab = None
    # dup docs re-seed from a nearby "source" doc id
    is_dup = _u01(F.col("id"), F.lit(seed), F.lit("dup")) < dup_rate
    src_id = F.when(
        is_dup & (F.col("id") > 16),
        F.col("id") - 1 - (F.abs(F.xxhash64("id", F.lit(seed))) % 16),
    ).otherwise(F.col("id"))
    if vocab is not None:
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(n_tokens - 1)),
            lambda i: F.get(
                vocab, (F.abs(F.xxhash64(src_id, i, F.lit(seed))) % n_vocab).cast("int")
            ),
        )
    else:
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(n_tokens - 1)),
            lambda i: F.concat(
                F.lit("w"), (F.abs(F.xxhash64(src_id, i, F.lit(seed))) % n_vocab).cast("string")
            ),
        )
    # perturb the final token of dup docs so they are NEAR-dups
    toks = F.when(
        is_dup, F.concat(F.slice(toks, 1, n_tokens - 1), F.array(F.lit("zzz")))
    ).otherwise(toks)
    text = F.array_join(toks, " ")
    langs = F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"), F.lit("zh"))
    return base.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.get(langs, (F.abs(F.xxhash64("id", F.lit(seed), F.lit("lang"))) % 5).cast("int")).alias(
            "lang"
        ),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def synthetic_embeddings(
    spark: SparkSession,
    n: int = 100_000,
    dim: int = 64,
    n_clusters: int = 10,
    seed: int = 42,
    dup_rate: float = 0.0,
    partitions: int | None = None,
) -> DataFrame:
    """Clustered float vectors: cluster centroid (hash of label) plus
    per-vector noise — labeled data for ANN recall tests at any n.
    Columns match the driver's embeddings table (vec_id, embedding,
    label).

    ``dup_rate``: fraction of vectors that are a tiny perturbation
    (cos ~0.999) of an earlier vector (id - 1..16, same label) —
    planted near-dup pairs for embedding-dedup recall tests; the
    source id is recoverable as ``id - 1 - (abs(xxhash64(id, seed,
    'esrc')) % 16)`` for rows where ``_u01(id, seed, 'edup') <
    dup_rate`` and id > 16."""
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    is_dup = (_u01(F.col("id"), F.lit(seed), F.lit("edup")) < dup_rate) & (F.col("id") > 16)
    src_id = F.when(
        is_dup, F.col("id") - 1 - (F.abs(F.xxhash64("id", F.lit(seed), F.lit("esrc"))) % 16)
    ).otherwise(F.col("id"))
    label = (F.abs(F.xxhash64(src_id, F.lit(seed), F.lit("c"))) % n_clusters).cast("int")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            (_u01(label, i, F.lit(seed)) - 0.5)  # centroid component
            + 0.25 * (_u01(src_id, i, F.lit(seed + 1)) - 0.5)  # noise
            # near-dup perturbation: tiny and only on dup rows
            + F.when(is_dup, 0.02 * (_u01(F.col("id"), i, F.lit(seed + 2)) - 0.5)).otherwise(
                F.lit(0.0)
            )
        ).cast("float"),
    )
    return base.select(
        F.col("id").alias("vec_id"), emb.alias("embedding"), label.alias("label")
    )
