"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
determinism, partition invariance — plus the REAL dependency-free codecs
(24-bit BMP images, PCM WAV audio, uncompressed-DIB AVI video;
functions/codecs.py). All three modalities decode real containers; the
decoders are hostile-header safe (corrupt payloads raise ValueError and
the feature pass quarantines them via ``decode_ok = 0``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalable_blocking_for_privacy_preserving_record_linkage_spark.functions import codecs
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
    # payload is a real binary column; image/audio carry REAL containers
    row = media.where("media_id = 3").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["mime"] == "image/bmp"
    assert bytes(row["payload"][:2]) == b"BM"
    wav = media.where("media_id = 4").first()
    assert wav["meta"]["mime"] == "audio/wav"
    assert bytes(wav["payload"][:4]) == b"RIFF"
    vid = media.where("media_id = 5").first()
    assert vid["meta"]["mime"] == "video/avi"
    assert bytes(vid["payload"][:4]) == b"RIFF"
    assert bytes(vid["payload"][8:12]) == b"AVI "


def test_extract_features_deterministic(media):
    rows1 = multimodal.extract_features(media).collect()
    f1 = {r["media_id"]: (r["mean"], r["std"], r["phash"]) for r in rows1}
    f2 = {r["media_id"]: (r["mean"], r["std"], r["phash"]) for r in multimodal.extract_features(media.repartition(7)).collect()}
    assert f1 == f2 and len(f1) == 60
    assert all(0 <= v[0] <= 255 for v in f1.values())
    # every synthesized payload is a valid container -> all decode cleanly
    assert all(r["decode_ok"] == 1 for r in rows1)


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
    # frame means differ across frames (each AVI frame carries its own
    # md5(text||'|frame|'||idx) digest tiling)
    one = frames.where(f"media_id = {next(iter(meta))}").collect()
    if len(one) > 1:
        assert len({r["frame_mean"] for r in one}) > 1


def _expected_payload(doc_id: int, text: str) -> bytes:
    """Driver-side reconstruction of synthesize_media's payload."""
    kind, w, h, sr, nf = multimodal._media_dims(doc_id)
    seed = text.encode("utf-8")
    if kind == "image":
        px = multimodal._tiled_digest(seed, w * h * 3).reshape(h, w, 3)
        return codecs.encode_bmp(px, top_down=True)
    if kind == "audio":
        return codecs.encode_wav(multimodal._tiled_digest(seed, w * h * 3), sr, bits=8)
    frames = np.stack(
        [multimodal._frame_pixels(seed, f, w, h) for f in range(nf)]
    )
    return codecs.encode_avi(frames, top_down=True)


def test_payload_byte_stats_exact(spark):
    """Kernel byte stats must equal a driver-side recomputation from the
    reconstructed container bytes (BMP/WAV/AVI per kind); the empty-text
    video row (id 2) still carries a full AVI container."""
    texts = {0: "abc", 1: "xY", 2: "", 3: "Zz9"}  # image, audio, video, image
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    out = {
        r["media_id"]: r.asDict()
        for r in multimodal.payload_byte_stats(
            multimodal.synthesize_media(docs)
        ).collect()
    }
    assert len(out) == len(texts)
    for i, t in texts.items():
        raw = _expected_payload(i, t)
        r = out[i]
        assert r["n_bytes"] == len(raw), i
        assert r["byte_sum"] == sum(raw), i
        assert r["first_byte"] == (raw[0] if raw else -1), i
        assert r["last_byte"] == (raw[-1] if raw else -1), i
        assert r["md5i"] == int(
            hashlib.md5(raw.hex().encode("ascii")).hexdigest()[:8], 16
        ), i


def test_bmp_codec_round_trip_and_foreign_files():
    """The BMP decoder is general, not just our encoder's inverse:
    round-trips in both row orders at padded widths, plus a hand-built
    bottom-up padded file with known pixels."""
    import struct

    rng = np.random.default_rng(0)
    for (h, w) in [(3, 3), (5, 7), (1, 1), (9, 6), (4, 5)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for td in (True, False):
            assert (codecs.decode_bmp(codecs.encode_bmp(px, top_down=td)) == px).all()
    # bottom-up, width 3 -> stride 12 (3 pad bytes/row), BGR storage
    pix = bytes(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 0, 0, 10, 11, 12, 13, 14, 15, 16, 17, 18, 0, 0, 0]
    )
    hdr = struct.pack(
        "<2sIHHIIiiHHIIiiII", b"BM", 54 + len(pix), 0, 0, 54,
        40, 3, 2, 1, 24, 0, len(pix), 0, 0, 0, 0,
    )
    img = codecs.decode_bmp(hdr + pix)
    assert img.shape == (2, 3, 3)
    assert img[1, 0].tolist() == [3, 2, 1]  # file's first row = bottom row, BGR->RGB
    assert img[0, 0].tolist() == [12, 11, 10]


def test_wav_codec_round_trip_and_chunk_walk():
    """8- and 16-bit PCM round-trips, and a file with an extra odd-sized
    chunk before `data` (the RIFF walk must skip it word-aligned)."""
    rng = np.random.default_rng(1)
    for bits, dt in ((8, np.uint8), (16, np.int16)):
        s = rng.integers(0, 200, 777).astype(dt)
        out, sr = codecs.decode_wav(codecs.encode_wav(s, 22050, bits=bits))
        assert sr == 22050 and (out == s).all()
    base = codecs.encode_wav(np.arange(10, dtype=np.uint8), 8000, bits=8)
    # splice in a 3-byte 'junk' chunk (padded to 4) between fmt and data
    fmt_end = 12 + 8 + 16
    spliced = base[:fmt_end] + b"junk" + (3).to_bytes(4, "little") + b"abc\x00" + base[fmt_end:]
    out, sr = codecs.decode_wav(spliced)
    assert sr == 8000 and out.tolist() == list(range(10))


def test_real_decode_recovers_synthesized_content(spark):
    """End-to-end: the REAL BMP/WAV/AVI decoders recover exactly the
    digest-tiled sample content from the synthesized containers — the
    invariant every mm_* oracle closed form rests on."""
    docs = spark.createDataFrame(
        [(0, "image doc"), (1, "audio doc"), (2, "video doc")],
        "doc_id long, text string",
    )
    rows = {r["media_id"]: r for r in multimodal.synthesize_media(docs).collect()}
    img = rows[0]
    w, h = img["meta"]["width"], img["meta"]["height"]
    want = multimodal._tiled_digest(b"image doc", w * h * 3).reshape(h, w, 3)
    assert (codecs.decode_bmp(bytes(img["payload"])) == want).all()
    aud = rows[1]
    w, h = aud["meta"]["width"], aud["meta"]["height"]
    samples, sr = codecs.decode_wav(bytes(aud["payload"]))
    assert sr == 16000
    assert (samples == multimodal._tiled_digest(b"audio doc", w * h * 3)).all()
    vid = rows[2]
    w, h = vid["meta"]["width"], vid["meta"]["height"]
    nf = vid["meta"]["n_frames"]
    frames = codecs.decode_avi(bytes(vid["payload"]))
    assert frames.shape == (nf, h, w, 3)
    for f in range(nf):
        assert (frames[f] == multimodal._frame_pixels(b"video doc", f, w, h)).all()


def test_avi_codec_round_trip_and_foreign_files():
    """The AVI decoder is general, not just our encoder's inverse:
    round-trips in both row orders at padded widths, plus a foreign-style
    file with a JUNK chunk before movi, an idx1 chunk after it, and
    '00dc' frame ids — the RIFF walk must skip unknowns word-aligned."""
    import struct

    rng = np.random.default_rng(2)
    for (nf, h, w) in [(1, 3, 3), (3, 5, 7), (2, 1, 1), (4, 9, 6)]:
        fr = rng.integers(0, 256, (nf, h, w, 3), dtype=np.uint8)
        for td in (True, False):
            enc = codecs.encode_avi(fr, top_down=td)
            assert len(enc) == codecs.avi_file_size(w, h, nf)
            assert (codecs.decode_avi(enc) == fr).all()
    # hand-splice: take a 2-frame encode, insert a 5-byte JUNK chunk
    # (word-padded) right after 'AVI ', rename frames to 00dc, and append
    # an idx1 chunk; decode must be unchanged
    fr = rng.integers(0, 256, (2, 2, 3, 3), dtype=np.uint8)
    base = codecs.encode_avi(fr, top_down=True)
    junk = b"JUNK" + struct.pack("<I", 5) + b"abcde\x00"
    spliced = base[:12] + junk + base[12:].replace(b"00db", b"00dc")
    idx1 = b"idx1" + struct.pack("<I", 16) + b"\x00" * 16
    spliced = spliced + idx1
    # patch the RIFF size for the added bytes
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    assert (codecs.decode_avi(spliced) == fr).all()


def test_decoders_reject_hostile_headers():
    """Corrupt/hostile payloads raise a clean ValueError (never over-read
    or allocate from header-declared dims): truncated pixel data, absurd
    dimensions, offsets past EOF, truncated RIFF chunks."""
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    bmp = codecs.encode_bmp(px, top_down=True)
    import struct

    # truncated pixel section
    with pytest.raises(ValueError):
        codecs.decode_bmp(bmp[:-5])
    # absurd height (would demand ~50 GB if trusted)
    evil = bytearray(bmp)
    struct.pack_into("<i", evil, 22, -(10**9))
    with pytest.raises(ValueError):
        codecs.decode_bmp(bytes(evil))
    # zero/negative width
    evil = bytearray(bmp)
    struct.pack_into("<i", evil, 18, -4)
    with pytest.raises(ValueError):
        codecs.decode_bmp(bytes(evil))
    # pixel-data offset past EOF
    evil = bytearray(bmp)
    struct.pack_into("<I", evil, 10, len(bmp) + 100)
    with pytest.raises(ValueError):
        codecs.decode_bmp(bytes(evil))
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"XX" + bmp[2:])  # wrong magic

    wav = codecs.encode_wav(np.arange(16, dtype=np.uint8), 8000, bits=8)
    with pytest.raises(ValueError):
        codecs.decode_wav(wav[:-3])  # truncated data chunk
    with pytest.raises(ValueError):
        codecs.decode_wav(wav[:20])  # no data chunk reachable

    avi = codecs.encode_avi(np.zeros((2, 3, 3, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        codecs.decode_avi(avi[:-7])  # truncated last frame chunk
    with pytest.raises(ValueError):
        codecs.decode_avi(b"RIFX" + avi[4:])  # wrong magic
    # absurd strf dims: frame-length validation must fail BEFORE any
    # (n, h, w, 3) allocation
    evil = bytearray(avi)
    strf_vals = evil.find(b"strf") + 8
    struct.pack_into("<ii", evil, strf_vals + 4, 2**20, -(2**20))
    with pytest.raises(ValueError):
        codecs.decode_avi(bytes(evil))


def test_extract_features_quarantines_corrupt_payloads(spark):
    """A corrupt payload yields decode_ok=0 with zeroed features instead
    of failing the stage — one bad row at 100-TB scale must not kill the
    job. Valid rows in the same Arrow batch are unaffected."""
    docs = spark.createDataFrame(
        [(0, "good image"), (1, "good audio"), (2, "good video")],
        "doc_id long, text string",
    )
    media = multimodal.synthesize_media(docs)
    # truncate payload on the image row only, keep schema intact
    corrupt = media.withColumn(
        "payload",
        F.when(
            F.col("media_id") == 0,
            F.expr("substring(payload, 1, 20)"),
        ).otherwise(F.col("payload")),
    )
    rows = {r["media_id"]: r for r in multimodal.extract_features(corrupt).collect()}
    bad = rows[0]
    assert bad["decode_ok"] == 0
    assert bad["n_bytes"] == 20  # raw length still reported
    assert bad["mean"] == 0.0 and bad["std"] == 0.0 and bad["phash"] == 0
    for mid in (1, 2):
        assert rows[mid]["decode_ok"] == 1
        assert rows[mid]["mean"] > 0
