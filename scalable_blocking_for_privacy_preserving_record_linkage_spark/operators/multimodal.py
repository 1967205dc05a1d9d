"""Multimodal columns for training-data pipelines: image/audio/video as
``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` kernels.

Decode status per modality (see :func:`_decode_backend`):

* **image — REAL**: payloads are valid 24-bit BMP files, decoded by the
  dependency-free byte-offset decoder in ``functions/codecs.py``
  (handles top-down and bottom-up row order, row padding, arbitrary
  pixel-data offset).
* **audio — REAL**: payloads are valid PCM WAV files (RIFF chunk walk,
  8/16-bit).
* **video — declared fake**: no container video codec can be written
  dependency-free; frames decode via the deterministic ``fakecodec``
  (md5-digest tiling), clearly marked, swappable at this one seam.

Media table schema (the multimodal analogue of the pages table):

    media(media_id: long, kind: string,        -- 'image' | 'audio' | 'video'
          payload: binary,                     -- encoded bytes (BMP/WAV/raw)
          meta: struct<mime:string, width:int, height:int,
                       sample_rate:int, n_frames:int>)

Deterministic synthesis from any (id, text) table keeps fixtures
reproducible without external data (``synthesize_media``): the DECODED
content (pixels / PCM samples) is always the md5 digest of the source
text tiled over the sample buffer, so every downstream feature stays a
closed-form function of ``md5(text)`` that the DuckDB driver oracle
recomputes — while the payload bytes themselves are real container
files whose header arithmetic the oracle also reproduces.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codecs import decode_bmp, decode_wav, encode_bmp, encode_wav
from ..sources.io import ensure_parallelism

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def _decode_backend() -> dict[str, str]:
    """Decode backend per modality: image and audio are REAL
    dependency-free decoders (functions/codecs.py); video keeps the
    declared deterministic fake — this mapping is the single seam a
    container video codec would slot into."""
    return {"image": "bmp", "audio": "wav", "video": "fakecodec"}


def _tiled_digest(seed: bytes, n: int) -> np.ndarray:
    """md5(seed) tiled to n bytes — the deterministic sample content for
    ALL synthesized media (and the fake video decode). Every derived
    feature is a closed-form function of the 16 digest bytes, so the
    DuckDB driver oracle value-checks the whole feature path from
    ``md5(text)`` hex."""
    digest = hashlib.md5(seed).digest()
    reps = -(-n // len(digest))
    return np.frombuffer((digest * reps)[:n], dtype=np.uint8)


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Declared-fake video decode: digest-tiled pixel buffer."""
    return _tiled_digest(payload, width * height * 3).reshape(height, width, 3)


def _media_dims(doc_id: int) -> tuple[str, int, int, int, int]:
    """(kind, width, height, sample_rate, n_frames) — pure function of
    the id so the DuckDB oracle rebuilds them arithmetically."""
    kind = ("image", "audio", "video")[doc_id % 3]
    w = doc_id % 16 * 8 + 32
    h = doc_id % 9 * 8 + 32
    sr = 16000 if kind == "audio" else 0
    nf = doc_id % 7 + 2 if kind == "video" else 1
    return kind, w, h, sr, nf


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministically derive a media table from any (id, text) table.

    Image rows carry a REAL 24-bit BMP payload and audio rows a REAL
    8-bit PCM WAV payload — both containing the md5(text) digest tiled
    over the sample buffer (w*h*3 bytes), so downstream features remain
    closed forms of ``md5(text)`` while the decode path exercises real
    container parsing. Video rows keep the raw utf-8 text bytes (the
    video decode is the declared fake). kind/dimensions derive from the
    id so the table covers all three modalities.
    """
    mimes = {"image": "image/bmp", "audio": "audio/wav", "video": "x-fake/video"}

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads, metas = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                doc_id = int(doc_id)
                kind, w, h, sr, nf = _media_dims(doc_id)
                seed = (text or "").encode("utf-8")
                if kind == "image":
                    px = _tiled_digest(seed, w * h * 3).reshape(h, w, 3)
                    payload = encode_bmp(px, top_down=True)
                elif kind == "audio":
                    payload = encode_wav(_tiled_digest(seed, w * h * 3), sr, bits=8)
                else:
                    payload = seed
                ids.append(doc_id)
                kinds.append(kind)
                payloads.append(payload)
                metas.append(
                    {
                        "mime": mimes[kind],
                        "width": w,
                        "height": h,
                        "sample_rate": sr,
                        "n_frames": nf,
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return ensure_parallelism(df).select(id_col, text_col).mapInPandas(
        fn, schema=MEDIA_SCHEMA
    )


_FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, mean double, std double, "
    "phash long"
)


def _decode_samples(kind: str, payload: bytes, w: int, h: int) -> np.ndarray:
    """Flat uint8 sample buffer per modality: REAL BMP decode for images,
    REAL WAV decode for audio, declared fake for video (see
    :func:`_decode_backend`)."""
    if kind == "image":
        return decode_bmp(payload).reshape(-1)
    if kind == "audio":
        samples, _sr = decode_wav(payload)
        return np.asarray(samples, dtype=np.uint8)
    return _fake_pixels(payload, w, h).reshape(-1)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract each payload (Arrow-batched mapInPandas).

    Output: (media_id, kind, n_bytes, mean, std, phash). Image payloads
    go through the REAL BMP decoder and audio payloads through the REAL
    WAV decoder (functions/codecs.py); only video uses the declared fake.

    mean/std are computed from exact integer sample sums (then one float
    division / sqrt), and phash compares integer samples against the
    integer sample-total (``sample*64 > total`` instead of
    ``sample > total/64``) — so the DuckDB oracle reproduces bit-identical
    IEEE results from the same closed forms over the md5 digest bytes
    (the synthesized decoded content; see ``synthesize_media``).
    phash: sign bits of 64 evenly-strided channel-0 samples vs their mean
    (a downsample-and-threshold perceptual-hash stand-in), low 63 bits.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": np.zeros(n, dtype=np.int32),
                "mean": np.zeros(n, dtype=np.float64),
                "std": np.zeros(n, dtype=np.float64),
                "phash": np.zeros(n, dtype=np.int64),
            }
            for i, (kind, payload, meta) in enumerate(
                zip(pdf["kind"], pdf["payload"], pdf["meta"])
            ):
                w, h = int(meta["width"]), int(meta["height"])
                buf = _decode_samples(kind, bytes(payload), w, h)
                nsm = buf.size
                s = int(buf.sum(dtype=np.int64))
                s2 = int((buf.astype(np.int64) ** 2).sum())
                mean = s / nsm
                out["n_bytes"][i] = len(payload)
                out["mean"][i] = mean
                out["std"][i] = float(np.sqrt(max(0.0, s2 / nsm - mean * mean)))
                flat_c0 = buf.reshape(-1, 3)[:, 0]
                idx = (np.arange(64) * (w * h)) // 64
                samples = flat_c0[idx].astype(np.int64)
                total = int(samples.sum())
                bits = samples[:63] * 64 > total
                out["phash"][i] = int(
                    sum(int(b) << j for j, b in enumerate(bits))
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, schema=_FEATURE_SCHEMA)


_BYTESTATS_SCHEMA = (
    "media_id long, kind string, n_bytes int, byte_sum long, "
    "first_byte int, last_byte int, md5i long"
)


def payload_byte_stats(media: DataFrame) -> DataFrame:
    """Codec-INDEPENDENT byte statistics of the raw payloads, computed
    inside the Arrow ``mapInPandas`` kernel (``np.frombuffer`` — no
    per-byte Python loop).

    Unlike the feature kernels these are exactly SQL-reproducible (the
    oracle rebuilds the BMP/WAV container bytes arithmetically), so the
    driver value-oracle covers the full binary Arrow path end to end: if
    payload bytes were corrupted, reordered, or truncated anywhere between
    the parquet scan and the Python worker, ``byte_sum``/``md5i`` would
    mismatch — a content check, not just the length check ``mm_inventory``
    provides. Empty payloads yield first/last byte ``-1`` and sum 0.
    ``md5i`` fingerprints the payload's canonical LOWERCASE-HEX encoding
    (computed in the kernel from the received bytes — a bijection, so the
    integrity guarantee is unchanged): DuckDB's md5 only accepts VARCHAR,
    and real container payloads are not valid UTF-8.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": np.zeros(n, dtype=np.int32),
                "byte_sum": np.zeros(n, dtype=np.int64),
                "first_byte": np.full(n, -1, dtype=np.int32),
                "last_byte": np.full(n, -1, dtype=np.int32),
                "md5i": np.zeros(n, dtype=np.int64),
            }
            for i, payload in enumerate(pdf["payload"]):
                raw = bytes(payload)
                b = np.frombuffer(raw, dtype=np.uint8)
                out["n_bytes"][i] = b.size
                out["byte_sum"][i] = int(b.sum(dtype=np.int64))
                if b.size:
                    out["first_byte"][i] = int(b[0])
                    out["last_byte"][i] = int(b[-1])
                out["md5i"][i] = int(
                    hashlib.md5(raw.hex().encode("ascii")).hexdigest()[:8], 16
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, schema=_BYTESTATS_SCHEMA)


_RESIZE_SCHEMA = (
    "media_id long, width int, height int, payload binary, byte_sum long"
)


def resize_images(media: DataFrame, target: int = 64) -> DataFrame:
    """Resize the image payloads to ``target`` x ``target`` (REAL BMP
    decode -> nearest-neighbor sample -> re-encode as raw RGB bytes).

    ``byte_sum`` is the integer sum of the RESIZED payload bytes, computed
    from the output array inside the kernel — the DuckDB oracle recomputes
    it from the closed form over the md5 digest (the synthesized pixel
    content; nearest-neighbor index arithmetic), value-checking the actual
    resample content, not just the output dimensions."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # zip over column arrays, not .iterrows() — per-item decode is
            # inherent (variable-size payloads), but row-Series construction
            # isn't, and it dominates at small payloads
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "image":
                    continue
                w, h = int(meta["width"]), int(meta["height"])
                px = decode_bmp(bytes(payload))
                yi = (np.arange(target) * h // target).clip(0, h - 1)
                xi = (np.arange(target) * w // target).clip(0, w - 1)
                resized = px[np.ix_(yi, xi)]
                rows.append(
                    (
                        int(mid),
                        target,
                        target,
                        resized.tobytes(),
                        int(resized.sum(dtype=np.int64)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "payload", "byte_sum"],
            )

    return media.mapInPandas(fn, schema=_RESIZE_SCHEMA)


_FRAME_SCHEMA = "media_id long, frame_idx int, frame_mean double"


def sample_frames(media: DataFrame, every: int = 1) -> DataFrame:
    """Sample frames from video payloads: one output row per kept frame."""
    assert _decode_backend()["video"] == "fakecodec"  # declared-fake seam

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, means = [], [], []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                w, h = int(meta["width"]), int(meta["height"])
                nf = int(meta["n_frames"])
                for f_idx in range(0, nf, every):
                    # ASCII frame suffix so the oracle can rebuild the
                    # per-frame digest as md5(text || '|frame|' || idx)
                    frame = _fake_pixels(
                        bytes(payload) + f"|frame|{f_idx}".encode(), w, h
                    )
                    ids.append(int(mid))
                    idxs.append(f_idx)
                    # exact integer sum then one float division — same IEEE
                    # ops as the oracle's closed form over the digest bytes
                    means.append(int(frame.sum(dtype=np.int64)) / frame.size)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_mean": means})

    return media.mapInPandas(fn, schema=_FRAME_SCHEMA)
