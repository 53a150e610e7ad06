"""Multimodal plumbing: Arrow binary transfer through mapInPandas,
decode stub gating, frame-sample fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascading_hive_spark.operators import multimodal as M
from cascading_hive_spark.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return M.attach_binary(docs, "doc_id", "text").cache()


def test_attach_binary_schema(media):
    assert [f.name for f in media.schema.fields] == ["id", "payload", "meta"]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    assert media.schema["meta"].dataType.simpleString() == "struct<mime:string,n_bytes:int>"


def test_extract_meta_roundtrip(spark, media, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = M.extract_meta(media)
    joined = out.join(docs, out.id == docs.doc_id).select(
        "id", "n_bytes", "first_byte", F.length("text").alias("expected_len")
    )
    bad = joined.filter(F.col("n_bytes") != F.col("expected_len")).count()
    assert bad == 0
    row = out.filter(F.col("id") == 0).collect()[0]
    text0 = docs.filter(F.col("doc_id") == 0).collect()[0].text
    assert row.first_byte == ord(text0[0])
    assert row.checksum == (len(text0.encode()) * 2654435761 + ord(text0[0])) % (1 << 31)


def test_decode_image_stub_raises_without_pil(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; stub not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        M.decode_image(media)


def test_frame_sample_offsets(media):
    out = M.frame_sample(media, every_n_bytes=64)
    r = out.filter(F.col("id") == 0).collect()
    offsets = sorted(x.offset for x in r)
    assert offsets[0] == 0
    assert all(o % 64 == 0 for o in offsets)


def test_resize_payload_binary_roundtrip(spark, media, sf_dir):
    out = M.resize_payload(media, factor=4)
    docs = load_table(spark, sf_dir, "documents")
    row = out.filter(F.col("id") == 0).collect()[0]
    text0 = docs.filter(F.col("doc_id") == 0).collect()[0].text.encode()
    assert bytes(row.payload) == text0[::4]  # binary OUT of Arrow intact
    assert row.orig_bytes == len(text0)
    # schema carries a true binary column
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)["payload"] == "binary"


def test_partition_by_content_prefix_spreads_skewed_blobs(spark, media):
    """A deliberately single-partition clustered input must spread
    across buckets: many non-empty output partitions, no partition
    holding a skewed share, deterministic bucket per content."""
    clustered = media.coalesce(1)
    out = M.partition_by_content_prefix(clustered, n_buckets=16)
    sizes = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    n_rows = sum(r["count"] for r in sizes)
    assert len(sizes) >= 8  # spread well beyond the 1 input partition
    assert max(r["count"] for r in sizes) <= 0.3 * n_rows  # no skewed task
    # hash partitioning reached the plan (not round-robin)
    assert "hashpartitioning" in out._jdf.queryExecution().executedPlan().toString()
    # deterministic: same content -> same bucket across two runs
    a = {(r.id, r.bucket) for r in out.select("id", "bucket").collect()}
    b = {
        (r.id, r.bucket)
        for r in M.partition_by_content_prefix(clustered, n_buckets=16)
        .select("id", "bucket")
        .collect()
    }
    assert a == b
