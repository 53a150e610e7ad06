"""Sequence packing — the training-pipeline step that concatenates
documents into fixed-capacity context windows (nothing comparable in
the reference; the batch-assembly analog of the text/dedup surface).

A trainer wants sequences near ``capacity`` tokens with no document
split across sequences. Optimal bin packing is NP-hard and inherently
sequential; the scalable form is GROUPED NEXT-FIT: hash documents into
independent groups, walk each group in a deterministic order, and
start a new sequence whenever the running fill would overflow. Groups
are embarrassingly parallel — the only shuffle is one hash partition
of thin (id, n_tokens) rows — and each group's walk is a single
Arrow-batched pass (applyInPandas), so 100 TB packs as
O(corpus / n_groups) per task with no global sort and no driver state.

Determinism contract: same (ids, token counts, capacity, grouping) →
same packing, regardless of cluster size or partitioning — asserted
in tests and mirrored exactly by a recursive-CTE DuckDB oracle
(queries.py: pack_sequences).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = "doc_id long, pack_group int, n_tokens int, seq bigint"


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str | None = None,
    token_col: str | None = None,
    capacity: int = 2048,
    n_groups: int = 64,
    group_expr: Column | None = None,
) -> DataFrame:
    """Assign every document to a (pack_group, seq) context window.

    Token counts come from ``token_col`` if given, else a whitespace
    count of ``text_col`` (computed scan-side). ``group_expr``
    overrides the default content-spread grouping
    ``pmod(xxhash64(id), n_groups)`` — pass an engine-portable
    expression (e.g. ``id % n``) when an external oracle must
    reproduce the packing. Within a group, documents pack in ``id``
    order with next-fit: overflow starts a new sequence; an oversized
    single document gets its own sequence (never split, never
    dropped).

    Output: (doc_id, pack_group, n_tokens, seq).
    """
    if (text_col is None) == (token_col is None):
        raise ValueError("pass exactly one of text_col / token_col")
    n_tok = (
        F.col(token_col)
        if token_col
        else F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    ).cast("int")
    group = (
        group_expr
        if group_expr is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups))
    ).cast("int")
    # NULL text / token counts would reach the pandas walk as NaN and
    # die with an opaque executor error on int(t); a document with no
    # measurable length cannot be packed, so drop it explicitly here
    # (scan-side, before the thin-row shuffle).
    thin = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        group.alias("pack_group"),
        n_tok.alias("n_tokens"),
    ).filter(F.col("n_tokens").isNotNull())

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        seqs: list[int] = []
        fill, seq = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if fill > 0 and fill + t > capacity:
                seq += 1
                fill = t
            else:
                fill += t
            seqs.append(seq)
        pdf["seq"] = pd.Series(seqs, dtype="int64")
        return pdf[["doc_id", "pack_group", "n_tokens", "seq"]]

    return thin.groupBy("pack_group").applyInPandas(walk, PACKED_SCHEMA)


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-sequence fill statistics (the packing-efficiency readout):
    one row per (pack_group, seq) with document count, token fill and
    utilization."""
    return (
        packed.groupBy("pack_group", "seq")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("fill_tokens"),
        )
        .withColumn(
            "utilization", F.round(F.col("fill_tokens") / F.lit(capacity), 4)
        )
    )


def shard_by_token_budget(
    df: DataFrame,
    id_col: str,
    budget: int,
    text_col: str | None = None,
    token_col: str | None = None,
    seed: int = 0,
    bucket_chars: int = 2,
) -> DataFrame:
    """Assign documents to fixed-token-budget output SHARDS — the
    writer-side companion of ``pack_sequences`` (which fills model
    context windows): training corpora ship as shard files of roughly
    equal token mass, so loaders stream them uniformly. A document
    goes to ``shard = floor(tokens_before_it / budget)`` in a
    deterministic md5(seed|id) order; shard token totals therefore
    land within one document of ``budget``, and same inputs → same
    shards on any partitioning, any engine.

    The global running token total uses the two-phase prefix-sum
    pattern (the deterministic_shuffle discipline, applied to SUMS
    instead of counts): per-bucket cumulative sums run partitioned by
    the hash prefix (parallel), per-bucket token totals prefix-sum in
    a ≤16**bucket_chars-row window and broadcast back as offsets —
    no single-partition window ever touches the corpus.

    Output: ``df``'s columns plus ``n_tokens`` and ``shard``.
    """
    from pyspark.sql import Window

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if (text_col is None) == (token_col is None):
        raise ValueError("pass exactly one of text_col / token_col")
    n_tok = (
        F.col(token_col)
        if token_col
        else F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    ).cast("bigint")
    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    bucketed = (
        df.withColumn("n_tokens", n_tok)
        .filter(F.col("n_tokens").isNotNull())
        .withColumn("_h", h)
        .withColumn("_bucket", F.substring(F.col("_h"), 1, bucket_chars))
    )
    totals = bucketed.groupBy("_bucket").agg(F.sum("n_tokens").alias("_tot"))
    w_off = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "_bucket", (F.sum("_tot").over(w_off) - F.col("_tot")).alias("_offset")
    )
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(F.col("_h"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.withColumn("_cum", F.sum("n_tokens").over(w_in))
        .join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "shard",
            F.floor(
                (F.col("_offset") + F.col("_cum") - F.col("n_tokens"))
                / F.lit(budget)
            ).cast("bigint"),
        )
        .drop("_h", "_bucket", "_cum", "_offset")
    )
