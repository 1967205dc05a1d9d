"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
determinism, partition invariance. The decode itself is the documented
deterministic fake (no codecs in this container); everything Spark-side
is real.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document body number {i} " * (i % 5 + 1)) for i in range(60)],
        "doc_id long, text string",
    )
    return multimodal.synthesize_media(docs).cache()


def test_media_schema(media):
    # nullability differs between expression-derived and declared schemas;
    # names and types are the contract
    assert media.schema.simpleString() == multimodal.MEDIA_SCHEMA.simpleString()
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # payload is a real binary column
    row = media.where("media_id = 3").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["mime"].startswith("x-fake/")


def test_extract_features_deterministic(media):
    f1 = {r["media_id"]: (r["mean"], r["std"], r["phash"]) for r in multimodal.extract_features(media).collect()}
    f2 = {r["media_id"]: (r["mean"], r["std"], r["phash"]) for r in multimodal.extract_features(media.repartition(7)).collect()}
    assert f1 == f2 and len(f1) == 60
    assert all(0 <= v[0] <= 255 for v in f1.values())


def test_resize_images_shape(media):
    out = multimodal.resize_images(media, target=16).collect()
    n_images = media.where("kind = 'image'").count()
    assert len(out) == n_images > 0
    for r in out:
        assert (r["width"], r["height"]) == (16, 16)
        assert len(r["payload"]) == 16 * 16 * 3  # raw RGB bytes


def test_sample_frames(media):
    frames = multimodal.sample_frames(media, every=2)
    got = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    meta = {r["media_id"]: r["meta"]["n_frames"] for r in media.where("kind='video'").collect()}
    assert {r["media_id"] for r in got} == set(meta)
    for r in got:
        expect = (meta[r["media_id"]] + 1) // 2
        assert r["n"] == expect
    # frame means differ across frames (payload+idx seeds the fake decode)
    one = frames.where(f"media_id = {next(iter(meta))}").collect()
    if len(one) > 1:
        assert len({r["frame_mean"] for r in one}) > 1


def test_payload_byte_stats_exact(spark):
    """Kernel byte stats must equal a driver-side recomputation from the
    raw text bytes, including the empty-payload sentinel row."""
    import hashlib

    texts = {0: "abc", 1: "", 2: "Zz9"}
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    out = {
        r["media_id"]: r.asDict()
        for r in multimodal.payload_byte_stats(
            multimodal.synthesize_media(docs)
        ).collect()
    }
    assert len(out) == 3
    for i, t in texts.items():
        raw = t.encode()
        r = out[i]
        assert r["n_bytes"] == len(raw)
        assert r["byte_sum"] == sum(raw)
        assert r["first_byte"] == (raw[0] if raw else -1)
        assert r["last_byte"] == (raw[-1] if raw else -1)
        assert r["md5i"] == int(hashlib.md5(raw).hexdigest()[:8], 16)
