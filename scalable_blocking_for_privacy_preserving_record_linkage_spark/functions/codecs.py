"""Dependency-free REAL codecs for the multimodal path: 24-bit BMP
(image) and PCM WAV (audio), both pure byte-offset arithmetic over numpy
buffers — no imaging/audio libraries exist in this container, and none
are needed for uncompressed formats.

These are the production decode seam ``operators/multimodal.py`` routes
image/audio payloads through: ``synthesize_media`` emits REAL, valid
BMP/WAV files, and the feature/resize kernels decode them with the
functions here (only the video modality keeps the declared fake codec).
Encoders exist so fixtures can be synthesized deterministically; the
decoders are general (BMP: top-down AND bottom-up row order, row padding,
24bpp; WAV: RIFF chunk walk, 8- and 16-bit PCM, trailing chunks), not
just inverses of our encoder — pinned by round-trip and hand-built-file
tests in tests/test_multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_HEADER_SIZE = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)
WAV_HEADER_SIZE = 44  # RIFF + fmt (16-byte PCM) + data chunk header


def bmp_row_stride(width: int) -> int:
    """Bytes per stored row: 3 bytes/pixel padded up to a 4-byte boundary."""
    return (width * 3 + 3) & ~3


def encode_bmp(px: np.ndarray, top_down: bool = True) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP.

    BMP stores B,G,R per pixel and pads each row to 4 bytes; ``top_down``
    writes rows in image order with a negative height field (valid per
    the BMP spec and common in practice), else bottom-up with a positive
    height. Fully vectorized (one channel flip + one row copy)."""
    h, w, c = px.shape
    if c != 3 or px.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8 RGB")
    stride = bmp_row_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[..., ::-1].reshape(h, w * 3)  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]
    data_size = stride * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM",
        BMP_HEADER_SIZE + data_size,  # file size
        0,
        0,  # reserved
        BMP_HEADER_SIZE,  # pixel data offset
        40,  # BITMAPINFOHEADER size
        w,
        -h if top_down else h,
        1,  # planes
        24,  # bits per pixel
        0,  # BI_RGB (uncompressed)
        data_size,
        0,
        0,  # x/y pixels-per-meter
        0,
        0,  # palette colors / important colors
    )
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array.

    Handles both row orders (sign of the height field), row padding, and
    an arbitrary pixel-data offset (extra header/palette bytes). Raises
    on compressed or non-24bpp files — out of scope for this container."""
    if len(data) < BMP_HEADER_SIZE or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (hdr={hdr_size}, bpp={bpp}, comp={compression})"
        )
    h = abs(h_signed)
    stride = bmp_row_stride(w)
    buf = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = buf.reshape(h, stride)[:, : w * 3]
    if h_signed > 0:  # bottom-up storage -> flip to image order
        rows = rows[::-1]
    return rows.reshape(h, w, 3)[..., ::-1]  # BGR -> RGB


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 8) -> bytes:
    """Encode mono PCM samples as a canonical 44-byte-header WAV file.

    8-bit PCM is unsigned (uint8 input); 16-bit is signed little-endian
    (int16 input) — the two layouts the PCM WAV format defines."""
    if bits == 8:
        raw = np.ascontiguousarray(samples, dtype=np.uint8).tobytes()
    elif bits == 16:
        raw = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block_align = bits // 8
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(raw),
        b"WAVE",
        b"fmt ",
        16,  # PCM fmt chunk size
        1,  # audio format: PCM
        1,  # channels: mono
        sample_rate,
        sample_rate * block_align,  # byte rate
        block_align,
        bits,
        b"data",
        len(raw),
    )
    return header + raw


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV file: walk the RIFF chunk list (word-aligned, so
    files with extra LIST/fact chunks parse too), return (samples,
    sample_rate). 8-bit -> uint8, 16-bit -> int16; mono only."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, bits, channels, raw = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            fmt, channels, sample_rate = struct.unpack_from("<HHI", data, body)
            bits = struct.unpack_from("<H", data, body + 14)[0]
            if fmt != 1:
                raise ValueError(f"unsupported WAV format {fmt} (PCM only)")
        elif cid == b"data":
            raw = data[body : body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if raw is None or sample_rate is None:
        raise ValueError("WAV missing fmt/data chunk")
    if channels != 1:
        raise ValueError(f"mono only (got {channels} channels)")
    if bits == 8:
        return np.frombuffer(raw, dtype=np.uint8), sample_rate
    if bits == 16:
        return np.frombuffer(raw, dtype="<i2"), sample_rate
    raise ValueError(f"unsupported bit depth {bits}")
