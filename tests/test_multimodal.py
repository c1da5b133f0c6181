"""Multimodal plumbing: schema contract, Arrow batch shape, frame math."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row

from admob_data_pipeline_spark.operators import multimodal


def _docs(spark, texts):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_pack_binary_envelope(spark):
    media = multimodal.pack_binary(_docs(spark, ["hello world"]))
    r = media.first()
    assert bytes(r.media) == b"hello world"
    assert r.media_meta.media_type == "image/fake"
    assert r.media_meta.byte_len == 11
    assert r.media_meta.checksum == hashlib.md5(b"hello world").hexdigest()


def test_extract_metadata_roundtrip(spark):
    texts = ["abc", "x" * 1000]
    media = multimodal.pack_binary(_docs(spark, texts))
    got = {r.doc_id: r for r in multimodal.extract_metadata(media).collect()}
    for i, t in enumerate(texts):
        w, h = multimodal.fake_decode_dims(len(t))
        assert got[i].byte_len == len(t)
        assert got[i].checksum == hashlib.md5(t.encode()).hexdigest()
        assert (got[i].width, got[i].height) == (w, h)


def test_frame_sample_covers_all_bytes(spark):
    text = "z" * 700  # 3 frames: 256 + 256 + 188
    media = multimodal.pack_binary(_docs(spark, [text]))
    frames = multimodal.frame_sample(media).orderBy("frame_idx").collect()
    assert [f.frame_bytes for f in frames] == [256, 256, 188]
    assert frames[0].frame_md5 == hashlib.md5(b"z" * 256).hexdigest()


def test_decode_image_stub_raises(spark):
    media = multimodal.pack_binary(_docs(spark, ["x"]))
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(media)


def test_media_shard_packing_capacity_and_order(spark):
    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators.multimodal import (
        pack_binary,
        pack_media_shards,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x" * 100) for i in range(10)]
    )
    # capacity 250, single bucket: shards of 2-3 files each (100B files —
    # a file goes to the shard its cumulative offset falls in)
    shards = pack_media_shards(pack_binary(docs), capacity=250, n_buckets=1).collect()
    assert sum(r.n_files for r in shards) == 10
    assert sum(r.shard_bytes for r in shards) == 1000
    for r in shards:
        assert r.first_doc <= r.last_doc
    # contiguity: shard ranges don't interleave within the bucket
    ordered = sorted(shards, key=lambda r: r.shard_id)
    for prev, nxt in zip(ordered, ordered[1:]):
        assert prev.last_doc < nxt.first_doc
