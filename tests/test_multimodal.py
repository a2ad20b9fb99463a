"""Multimodal plumbing tests: binary columns through Arrow batches,
stubbed decode with per-row error isolation, deterministic embedding,
frame-sample planning."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from pgloader_spark.operators.multimodal import (
    decode_image_meta,
    embed_media,
    fake_embedding,
    frame_sample_plan,
    image_metadata,
    make_png,
    sniff_mime,
)


def test_sniff_and_decode_png_gif():
    png = make_png(640, 480)
    assert sniff_mime(png) == "image/png"
    assert decode_image_meta(png) == ("image/png", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert decode_image_meta(gif) == ("image/gif", 320, 200)


def test_image_metadata_stage(spark):
    rows = [
        (1, make_png(100, 50)),
        (2, b"GIF87a" + struct.pack("<HH", 8, 8) + b"\x00" * 4),
        (3, b"\xff\xd8\xff\xe0 jpeg-ish"),  # stub has no jpeg decoder
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in image_metadata(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (100, 50)
    assert out[2]["mime"] == "image/gif"
    # unsupported media isolates to the error column, job survives
    assert out[3]["error"] is not None
    assert out[3]["mime"] == "image/jpeg"
    assert out[4]["n_bytes"] == 0


def test_embed_media_deterministic(spark):
    df = spark.createDataFrame(
        [(1, b"same bytes"), (2, b"same bytes"), (3, b"other")],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r["embedding"] for r in embed_media(df, dim=8).collect()}
    assert out[1] == out[2] != out[3]
    assert len(out[1]) == 8
    assert all(-1.0 <= v < 1.0 for v in out[1])
    # matches the driver-side function up to float32 storage precision
    expected = fake_embedding(b"same bytes", 8)
    assert all(abs(a - b) < 1e-6 for a, b in zip(out[1], expected))


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 10), (3, 0)], "doc_id long, n_frames int"
    )
    out = (
        frame_sample_plan(df, every=30)
        .groupBy("doc_id")
        .agg(F.collect_list("frame_ix").alias("fx"))
        .collect()
    )
    got = {r["doc_id"]: sorted(r["fx"]) for r in out}
    assert got[1] == [0, 30, 60, 90]
    assert got[2] == [0]
    assert got[3] == [0]


def test_jpeg_sof_marker_scan_decodes_dims():
    from pgloader_spark.operators.multimodal import (
        decode_image_meta,
        make_jpeg,
    )

    mime, w, h = decode_image_meta(make_jpeg(640, 480))
    assert (mime, w, h) == ("image/jpeg", 640, 480)
    # SOF behind an APP0 segment (typical camera files): still found
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    data = b"\xff\xd8" + app0 + make_jpeg(33, 21)[2:]
    assert decode_image_meta(data) == ("image/jpeg", 33, 21)
    # DHT (C4) must not be mistaken for a SOF
    dht = b"\xff\xc4\x00\x04\x00\x00"
    data = b"\xff\xd8" + dht + make_jpeg(12, 7)[2:]
    assert decode_image_meta(data) == ("image/jpeg", 12, 7)


def test_jpeg_without_sof_reports_error():
    import pytest as _pytest

    from pgloader_spark.operators.multimodal import (
        UnsupportedMediaError,
        decode_image_meta,
    )

    with _pytest.raises(UnsupportedMediaError):
        decode_image_meta(b"\xff\xd8\xff\xd9")


def test_user_registered_encoder_end_to_end(spark):
    """register_encoder -> embed_media -> semantic_dedup: the round-3
    verdict's pluggable-encoder contract. The user owns bytes->vector;
    the engine owns batching/schema/partitioning and everything
    downstream consumes the vectors unchanged."""
    import pytest as _pytest

    from pgloader_spark.operators import similarity
    from pgloader_spark.operators.multimodal import (
        get_encoder,
        register_encoder,
    )
    from pgloader_spark.operators.semdedup import semantic_dedup

    # nested def: cloudpickle ships it by VALUE, the same way a user's
    # notebook-defined encoder reaches executors
    def _length_encoder(data: bytes, dim: int) -> list[float]:
        v = [0.0] * dim
        v[0] = float(len(data))
        if data and dim > 1:
            v[1] = float(data[0])
        return v

    register_encoder("len-probe", _length_encoder)
    assert get_encoder("len_probe") is _length_encoder  # both spellings
    with _pytest.raises(KeyError):
        get_encoder("nope")

    rows = [
        (1, b"aaaa"), (2, b"aaaa"),        # identical payloads
        (3, b"\x00\x00"), (4, None),       # near-orthogonal + null
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    emb = embed_media(df, dim=4, encoder="len-probe")
    got = {r["doc_id"]: r["embedding"] for r in emb.collect()}
    assert got[1] == [4.0, 97.0, 0.0, 0.0]
    assert got[1] == got[2]
    assert got[3] == [2.0, 0.0, 0.0, 0.0]
    assert got[4] == [0.0, 0.0, 0.0, 0.0]  # null payload -> b""

    # downstream: semantic dedup over the user-encoded vectors drops
    # one of the identical pair, keeps the distinct docs
    vecs = emb.withColumnRenamed("doc_id", "vec_id")
    cents = similarity.ivf_centroids(vecs, n_centroids=1)
    kept = {r["vec_id"] for r in
            semantic_dedup(vecs, cents, tau=0.9, id_col="vec_id").collect()}
    assert 3 in kept
    assert len({1, 2} & kept) == 1

    # a direct callable works too (no registry entry needed)
    direct = embed_media(df, dim=4, encoder=_length_encoder)
    assert {r["doc_id"]: r["embedding"] for r in direct.collect()} == got
