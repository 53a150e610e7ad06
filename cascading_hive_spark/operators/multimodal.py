"""Multimodal (binary media) columns — north-star surface.

Pattern: media travels as an opaque ``binary`` column plus a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
Pandas UDFs via ``mapInPandas`` so bytes never round-trip through
per-row Python pickling. The actual image/audio codecs are NOT in this
container, so ``decode_image`` is a stub gated behind import-try
(NotImplementedError without PIL), while ``extract_meta`` is a REAL
mapInPandas pipeline over the binary column with a deterministic
byte-level feature set — the Spark-side plumbing (schema, batching,
Arrow binary transfer, partitioning) is fully exercised and
oracle-checkable.

Scale notes: binary payloads dominate row size — keep them out of
shuffles (derive features scan-side, drop the blob before any wide
op); at 100 TB you partition by a content-derived prefix so a single
task never sees a skewed run of giant blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "id long, n_bytes int, first_byte int, checksum long, fake_width int, fake_height int"
)


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model a media table: the text payload re-encoded as an opaque
    binary column + typed metadata (format tag, byte length). Stands in
    for image/audio bytes with identical Spark plumbing."""
    # NOTE: no repartition here — binary payloads must not shuffle
    # (docstring scale note); mapInPandas parallelism follows the scan.
    return df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col).cast("binary")).alias("n_bytes"),
        ).alias("meta"),
    )


def partition_by_content_prefix(
    df: DataFrame,
    n_buckets: int = 256,
    payload_col: str = "payload",
    prefix_bytes: int = 64,
) -> DataFrame:
    """Spread blob rows across ``n_buckets`` by a content-derived
    bucket key — the docstring's scale rule made executable: media
    tables arrive clustered (a crawl writes one site's giant videos
    adjacently), so scan-order partitions hand single tasks skewed
    runs of huge payloads. Bucketing on xxhash64(payload prefix,
    length) redistributes them deterministically (same content → same
    bucket on every run, unlike round-robin) while hashing only
    ``prefix_bytes`` — never the full blob.

    The hash mixes the byte LENGTH with the prefix because media
    formats share magic-byte headers; length separates same-container
    files cheaply. The blob shuffle this causes is the point: one
    deliberate redistribution instead of per-task OOM downstream —
    call it once at ingest, before derived columns multiply row width.

    Output adds a ``bucket`` int column and is hash-partitioned on it
    (layout asserted in tests/test_multimodal.py).
    """
    bucket = F.pmod(
        F.xxhash64(
            F.substring(F.col(payload_col), 1, prefix_bytes), F.length(payload_col)
        ),
        F.lit(n_buckets),
    ).cast("int")
    return df.withColumn("bucket", bucket).repartition(n_buckets, F.col("bucket"))


def extract_meta(df: DataFrame) -> DataFrame:
    """Deterministic byte-level feature extraction over the binary
    column via mapInPandas (Arrow-batched; one Python worker pass per
    partition, zero per-row pickling).

    Features are pure functions of the bytes so a SQL oracle can
    replicate them: n_bytes, first_byte, a multiplicative checksum of
    (n_bytes, first_byte), and fake decode dims (n_bytes mod 640/480)
    standing in for image width/height.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload = pdf["payload"]
            n_bytes = payload.str.len().astype("int32")
            first = payload.map(lambda b: b[0] if len(b) else -1).astype("int32")
            checksum = (n_bytes.astype("int64") * 2654435761 + first) % (1 << 31)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "checksum": checksum,
                    "fake_width": (n_bytes % 640).astype("int32"),
                    "fake_height": (n_bytes % 480).astype("int32"),
                }
            )

    return df.mapInPandas(batches, META_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """Real image decode — requires PIL, which this container does not
    ship. The Spark plumbing (mapInPandas over binary, struct output)
    is identical to extract_meta; only the codec differs."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow; container ships no codecs — "
            "use extract_meta for the plumbing-equivalent deterministic path"
        ) from exc

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in it:
            dims = pdf["payload"].map(lambda b: Image.open(io.BytesIO(b)).size)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": dims.map(lambda s: s[0]),
                    "height": dims.map(lambda s: s[1]),
                }
            )

    return df.mapInPandas(batches, "id long, width int, height int")


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over the opaque payload: one row per sampled
    offset (explode of a JVM-side sequence — the same fan-out shape as
    video frame extraction, with deterministic offsets)."""
    return df.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.length("payload") - 1, F.lit(every_n_bytes))
        ).alias("offset"),
    )


def resize_payload(df: DataFrame, factor: int = 4) -> DataFrame:
    """'Resize' the opaque payload by deterministic byte subsampling
    (every ``factor``-th byte) — the binary-OUT direction of the Arrow
    plumbing (extract_meta is binary-IN). A real image resize swaps
    the subsampling lambda for a codec call; schema, batching and
    partition behavior are identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload": pdf["payload"].map(lambda b: bytes(b[::factor])),
                    "orig_bytes": pdf["payload"].str.len().astype("int64"),
                }
            )

    return df.mapInPandas(batches, "id long, payload binary, orig_bytes long")
