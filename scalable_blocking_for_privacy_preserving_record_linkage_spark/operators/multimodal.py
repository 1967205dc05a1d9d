"""Multimodal columns for training-data pipelines: image/audio/video as
opaque ``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` kernels.

The Spark-side plumbing — schemas, batch iteration, partitioning,
zero-copy Arrow transfer — is real and tested. The actual codec calls are
STUBBED: this container ships no image/audio libraries, so each kernel
routes through :func:`_decode_backend`, which uses a clearly-marked
deterministic fake ("fakecodec") unless a real backend (PIL, etc.) is
importable. Swapping in a real decoder changes ONE function; none of the
distributed plumbing moves.

Media table schema (the multimodal analogue of the pages table):

    media(media_id: long, kind: string,        -- 'image' | 'audio' | 'video'
          payload: binary,                     -- opaque encoded bytes
          meta: struct<mime:string, width:int, height:int,
                       sample_rate:int, n_frames:int>)

Deterministic synthesis from any (id, text) table keeps fixtures
reproducible without external data (``synthesize_media``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _decode_backend():
    """Return the decode backend. Real codecs are not installed in this
    container, so this resolves to the deterministic fake; the import-try
    documents exactly where a real backend would slot in."""
    try:  # pragma: no cover - container has no PIL
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image backend detected but intentionally not wired: "
            "implement _decode_real() before removing the fake"
        )
    except ImportError:
        return "fakecodec"


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a decoded image: the md5 digest of the
    payload tiled to fill the pixel buffer. Same payload -> same 'pixels'
    on every executor, AND every derived feature (mean/std/phash/resize
    byte sums) is a closed-form function of the 16 digest bytes — so the
    DuckDB driver oracle can value-check the whole feature path from
    ``md5(payload)`` hex without decoding anything."""
    digest = hashlib.md5(payload).digest()
    n = width * height * 3
    reps = -(-n // len(digest))
    return np.frombuffer((digest * reps)[:n], dtype=np.uint8).reshape(height, width, 3)


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministically derive a media table from any (id, text) table.

    payload = utf-8 bytes of the text (opaque as far as the pipeline is
    concerned); kind/dimensions derived from the id so the table covers
    all three modalities.
    """
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        F.concat(F.lit("x-fake/"), kind).alias("mime"),
        (F.col(id_col) % 16 * 8 + 32).cast("int").alias("width"),
        (F.col(id_col) % 9 * 8 + 32).cast("int").alias("height"),
        F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(0)).cast("int").alias("sample_rate"),
        F.when(kind == "video", (F.col(id_col) % 7 + 2)).otherwise(F.lit(1)).cast("int").alias("n_frames"),
    )
    return ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("payload"),
        meta.alias("meta"),
    )


_FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, mean double, std double, "
    "phash long"
)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract each payload (Arrow-batched mapInPandas).

    Output: (media_id, kind, n_bytes, mean, std, phash). The decode is the
    fake backend; everything around it (batch shape, schema, partition
    behavior) is production plumbing.

    mean/std are computed from exact integer pixel sums (then one float
    division / sqrt), and phash compares integer samples against the
    integer sample-total (``sample*64 > total`` instead of
    ``sample > total/64``) — so the DuckDB oracle reproduces bit-identical
    IEEE results from the same closed forms over the md5 digest bytes.
    phash: sign bits of 64 evenly-strided channel-0 samples vs their mean
    (a downsample-and-threshold perceptual-hash stand-in), low 63 bits.
    """
    assert _decode_backend() == "fakecodec"

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
            for i, (payload, meta) in enumerate(zip(pdf["payload"], pdf["meta"])):
                w, h = int(meta["width"]), int(meta["height"])
                px = _fake_pixels(bytes(payload), w, h)
                npx = px.size
                s = int(px.sum(dtype=np.int64))
                s2 = int((px.astype(np.int64) ** 2).sum())
                mean = s / npx
                out["n_bytes"][i] = len(payload)
                out["mean"][i] = mean
                out["std"][i] = float(np.sqrt(max(0.0, s2 / npx - mean * mean)))
                flat_c0 = px.reshape(-1, 3)[:, 0]
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

    Unlike the feature kernels these are exactly SQL-reproducible, so the
    driver value-oracle covers the full binary Arrow path end to end: if
    payload bytes were corrupted, reordered, or truncated anywhere between
    the parquet scan and the Python worker, ``byte_sum``/``md5i`` would
    mismatch — a content check, not just the length check ``mm_inventory``
    provides. Empty payloads yield first/last byte ``-1`` and sum 0.
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
                out["md5i"][i] = int(hashlib.md5(raw).hexdigest()[:8], 16)
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, schema=_BYTESTATS_SCHEMA)


_RESIZE_SCHEMA = (
    "media_id long, width int, height int, payload binary, byte_sum long"
)


def resize_images(media: DataFrame, target: int = 64) -> DataFrame:
    """Resize the image payloads to ``target`` x ``target`` (fake decode ->
    nearest-neighbor sample -> re-encode as raw RGB bytes).

    ``byte_sum`` is the integer sum of the RESIZED payload bytes, computed
    from the output array inside the kernel — the DuckDB oracle recomputes
    it from the closed form over the md5 digest (nearest-neighbor index
    arithmetic), value-checking the actual resample content, not just the
    output dimensions."""
    assert _decode_backend() == "fakecodec"

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
                px = _fake_pixels(bytes(payload), w, h)
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
    assert _decode_backend() == "fakecodec"

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
