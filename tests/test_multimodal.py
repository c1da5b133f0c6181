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


def test_bmp_decoder_is_pixel_exact(spark):
    """decode_bmp_features must reproduce the generator's pixels
    exactly: known 2-image fixture, per-channel sums computed in
    python, plus padding/flip coverage (widths hit different 4-byte
    paddings; a missed vertical flip changes the y-dependent sums)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from admob_data_pipeline_spark.operators import multimodal as mm

    out = tempfile.mkdtemp(prefix="bmp_test_")
    try:
        want = {}
        for img in (1, 2):  # widths 17, 18 → paddings 1, 2
            with open(os.path.join(out, f"img-{img}.bmp"), "wb") as fh:
                fh.write(mm.make_bmp(img))
            w, h = mm._bmp_dims(img)
            sums = [0, 0, 0]
            for x in range(w):
                for y in range(h):
                    px = mm._bmp_pixel(img, x, y)
                    for c in range(3):
                        sums[c] += px[c]
            want[f"img-{img}.bmp"] = (w, h, *sums)
        files = (
            spark.read.format("binaryFile")
            .load(out)
            .select(
                F.element_at(F.split(F.col("path"), "/"), -1).alias("file"),
                "content",
            )
        )
        got = {
            r.file: (r.width, r.height, r.r_sum, r.g_sum, r.b_sum)
            for r in mm.decode_bmp_features(files).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_bmp_decoder_rejects_non_bmp_payloads(spark):
    """A junk payload must fail loudly, not decode garbage."""
    import pytest
    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators import multimodal as mm

    files = spark.createDataFrame(
        [Row(file="junk.bin", content=bytearray(b"NOTABMP" * 20))]
    )
    with pytest.raises(Exception, match="not a BMP"):
        mm.decode_bmp_features(files).collect()


def test_wav_decoder_walks_chunks_and_deinterleaves(spark):
    """decode_wav_features must parse the RIFF container properly (the
    generator plants a LIST chunk between fmt and data) and
    de-interleave stereo frames — pinned against a python reference."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from admob_data_pipeline_spark.operators import multimodal as mm

    out = tempfile.mkdtemp(prefix="wav_test_")
    try:
        want = {}
        for clip in (0, 1):  # mono AND stereo
            with open(os.path.join(out, f"clip-{clip}.wav"), "wb") as fh:
                fh.write(mm.make_wav(clip))
            rate, n_ch, n = mm._wav_shape(clip)
            sums = [[0, 0], [0, 0]]
            for ch in range(n_ch):
                for i in range(n):
                    v = mm._wav_sample(clip, ch, i)
                    sums[ch][0] += v
                    sums[ch][1] += abs(v)
            want[f"clip-{clip}.wav"] = (
                rate, n_ch, n, sums[0][0], sums[0][1], sums[1][0], sums[1][1]
            )
        files = (
            spark.read.format("binaryFile")
            .load(out)
            .select(
                F.element_at(F.split(F.col("path"), "/"), -1).alias("file"),
                "content",
            )
        )
        got = {
            r.file: (
                r.sample_rate, r.n_channels, r.n_samples,
                r.sum_ch0, r.abs_sum_ch0, r.sum_ch1, r.abs_sum_ch1,
            )
            for r in mm.decode_wav_features(files).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_wav_decoder_rejects_non_pcm(spark):
    import struct

    import pytest
    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators import multimodal as mm

    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)  # codec 85 = mp3
    buf = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    files = spark.createDataFrame([Row(file="x.wav", content=bytearray(buf))])
    with pytest.raises(Exception, match="16-bit PCM"):
        mm.decode_wav_features(files).collect()
