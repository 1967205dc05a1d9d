"""Multimodal columns for training-data pipelines: image/audio/video as
``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` kernels.

Decode status per modality (see :func:`_decode_backend`) — ALL REAL as
of round 5:

* **image — REAL**: payloads are valid 24-bit BMP files, decoded by the
  dependency-free byte-offset decoder in ``functions/codecs.py``
  (handles top-down and bottom-up row order, row padding, arbitrary
  pixel-data offset).
* **audio — REAL**: payloads are valid PCM WAV files (RIFF chunk walk,
  8/16-bit).
* **video — REAL**: payloads are valid uncompressed 24-bit DIB AVI files
  ('vids'/'DIB ' stream, one '00db' chunk per frame), decoded by the
  general RIFF walk in ``functions/codecs.py`` (both row orders, row
  padding, unknown-chunk skipping).

Corrupt payloads QUARANTINE instead of crashing the job: the decoders
validate header-declared sizes against the buffer and raise ValueError,
and :func:`extract_features` converts that per-row into
``decode_ok = 0`` with zeroed features — the behavior a feature pass
over 100 TB of untrusted bytes needs (one bad row must not kill a
stage).

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

from ..functions.codecs import (
    decode_avi,
    decode_bmp,
    decode_wav,
    encode_avi,
    encode_bmp,
    encode_wav,
)
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
    """Decode backend per modality — all three are REAL dependency-free
    container decoders in functions/codecs.py (no fake path remains)."""
    return {"image": "bmp", "audio": "wav", "video": "avi"}


def _tiled_digest(seed: bytes, n: int) -> np.ndarray:
    """md5(seed) tiled to n bytes — the deterministic sample content for
    ALL synthesized media (and the fake video decode). Every derived
    feature is a closed-form function of the 16 digest bytes, so the
    DuckDB driver oracle value-checks the whole feature path from
    ``md5(text)`` hex."""
    digest = hashlib.md5(seed).digest()
    reps = -(-n // len(digest))
    return np.frombuffer((digest * reps)[:n], dtype=np.uint8)


def _frame_pixels(seed: bytes, frame_idx: int, width: int, height: int) -> np.ndarray:
    """Synthesized content of video frame ``frame_idx``: the digest of
    ``seed || '|frame|' || idx`` tiled over the (h, w, 3) pixel buffer —
    ASCII suffix so the DuckDB oracle rebuilds each frame's digest as
    md5(text || '|frame|' || idx)."""
    return _tiled_digest(
        seed + f"|frame|{frame_idx}".encode(), width * height * 3
    ).reshape(height, width, 3)


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

    Image rows carry a REAL 24-bit BMP payload, audio rows a REAL 8-bit
    PCM WAV payload (both containing the md5(text) digest tiled over the
    w*h*3 sample buffer), and video rows a REAL uncompressed-DIB AVI
    whose frame ``f`` contains the md5(text || '|frame|' || f) digest
    tiled over its own (h, w, 3) buffer — so every downstream feature
    stays a closed form of md5 hex the DuckDB oracle recomputes, while
    the decode path exercises real container parsing for all three
    modalities. kind/dimensions derive from the id so the table covers
    all three.
    """
    mimes = {"image": "image/bmp", "audio": "audio/wav", "video": "video/avi"}

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
                    frames = np.stack(
                        [_frame_pixels(seed, f, w, h) for f in range(nf)]
                    )
                    payload = encode_avi(frames, top_down=True)
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
    "phash long, decode_ok int"
)


def _decode_samples(kind: str, payload: bytes) -> np.ndarray:
    """Flat uint8 sample buffer per modality — REAL container decode for
    all three (functions/codecs.py): BMP pixels for images, PCM samples
    for audio, every frame's pixels concatenated for video."""
    if kind == "image":
        return decode_bmp(payload).reshape(-1)
    if kind == "audio":
        samples, _sr = decode_wav(payload)
        return np.asarray(samples, dtype=np.uint8)
    return decode_avi(payload).reshape(-1)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract each payload (Arrow-batched mapInPandas).

    Output: (media_id, kind, n_bytes, mean, std, phash, decode_ok). All
    three modalities go through the REAL container decoders in
    functions/codecs.py (BMP / WAV / uncompressed-DIB AVI; video samples
    are all frames' pixels concatenated).

    **Quarantine, don't crash**: a payload whose container fails to
    decode (truncated, hostile dims, wrong magic) yields ``decode_ok=0``
    with zeroed features instead of failing the task — at 100-TB scale
    one corrupt row must not kill the stage; callers filter or route on
    ``decode_ok``.

    mean/std are computed from exact integer sample sums (then one float
    division / sqrt), and phash compares integer samples against the
    integer sample-total (``sample*64 > total`` instead of
    ``sample > total/64``) — so the DuckDB oracle reproduces bit-identical
    IEEE results from the same closed forms over the md5 digest bytes
    (the synthesized decoded content; see ``synthesize_media``).
    phash: sign bits of 64 evenly-strided channel-0 samples vs their mean
    (a downsample-and-threshold perceptual-hash stand-in), low 63 bits —
    strided over the FIRST w*h pixels, i.e. frame 0 for video.
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
                "decode_ok": np.zeros(n, dtype=np.int32),
            }
            for i, (kind, payload, meta) in enumerate(
                zip(pdf["kind"], pdf["payload"], pdf["meta"])
            ):
                w, h = int(meta["width"]), int(meta["height"])
                raw = bytes(payload)
                out["n_bytes"][i] = len(raw)
                try:
                    buf = _decode_samples(kind, raw)
                except ValueError:
                    continue  # decode_ok stays 0, features stay zeroed
                nsm = buf.size
                s = int(buf.sum(dtype=np.int64))
                s2 = int((buf.astype(np.int64) ** 2).sum())
                mean = s / nsm
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
                out["decode_ok"][i] = 1
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
    """Sample frames from video payloads: one output row per kept frame,
    REAL-decoded from the AVI container (functions/codecs.py) — the
    frame-sampling primitive of a video training pipeline, run over the
    actual '00db' DIB chunks, not metadata."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, means = [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                frames = decode_avi(bytes(payload))
                for f_idx in range(0, len(frames), every):
                    frame = frames[f_idx]
                    ids.append(int(mid))
                    idxs.append(f_idx)
                    # exact integer sum then one float division — same IEEE
                    # ops as the oracle's closed form over the digest bytes
                    # (synthesized frame f content = md5(text||'|frame|'||f)
                    # tiled; see synthesize_media)
                    means.append(int(frame.sum(dtype=np.int64)) / frame.size)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_mean": means})

    return media.mapInPandas(fn, schema=_FRAME_SCHEMA)
