"""Dependency-free REAL codecs for the multimodal path: 24-bit BMP
(image), PCM WAV (audio), and uncompressed-DIB AVI (video) — all pure
byte-offset arithmetic over numpy buffers; no imaging/audio libraries
exist in this container, and none are needed for uncompressed formats.

These are the production decode seam ``operators/multimodal.py`` routes
every payload through: ``synthesize_media`` emits REAL, valid BMP/WAV/AVI
files, and the feature/resize/frame kernels decode them with the
functions here. Encoders exist so fixtures can be synthesized
deterministically; the decoders are general (BMP/AVI frames: top-down AND
bottom-up row order, row padding, 24bpp; WAV/AVI: RIFF chunk walk that
skips unknown chunks like JUNK/idx1/LIST INFO; WAV: 8- and 16-bit PCM),
not just inverses of our encoders — pinned by round-trip, hand-built-file
and corrupt-header tests in tests/test_multimodal.py.

Decoders VALIDATE header-declared sizes against the actual buffer before
any ``np.frombuffer`` (a hostile width/height/chunk-size raises a clean
``ValueError`` instead of over-reading) so a feature pass over untrusted
payloads at 100-TB scale can quarantine corrupt rows per-record.
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
    on compressed or non-24bpp files — out of scope for this container.

    Hostile-header safe: width/height/offset are validated against the
    actual buffer length BEFORE the frombuffer view, so a crafted header
    (negative width, absurd dims, offset past EOF, truncated pixel data)
    raises a clean ValueError rather than over-reading or reshaping
    garbage — the quarantine contract the multimodal feature pass relies
    on (``decode_ok = false``) for corrupt rows at scale."""
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
    if w <= 0 or h == 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h_signed}")
    stride = bmp_row_stride(w)
    if data_offset < BMP_HEADER_SIZE or data_offset + stride * h > len(data):
        raise ValueError(
            f"BMP pixel data out of bounds (offset={data_offset}, "
            f"need={stride * h}, have={len(data) - min(data_offset, len(data))})"
        )
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
        if body + size > len(data):
            raise ValueError(
                f"truncated WAV chunk {cid!r} (declares {size}, "
                f"have {len(data) - body})"
            )
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"short WAV fmt chunk ({size} bytes)")
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
        if len(raw) % 2:
            raise ValueError("odd-length 16-bit WAV data chunk")
        return np.frombuffer(raw, dtype="<i2"), sample_rate
    raise ValueError(f"unsupported bit depth {bits}")


# AVI: RIFF('AVI ') with LIST hdrl (avih 56B + LIST strl (strh 56B +
# strf 40B BITMAPINFOHEADER)) and LIST movi of '00db' uncompressed-DIB
# frame chunks. With these fixed sub-chunks the header is exactly 224
# bytes, so the file size is the closed form the DuckDB oracles rebuild:
# 224 + n_frames * (8 + stride*h).
AVI_HEADER_SIZE = 224
_AVI_FPS = 10  # fixed frame rate for synthesized fixtures


def avi_file_size(width: int, height: int, n_frames: int) -> int:
    """Closed-form container size of an encode_avi output."""
    return AVI_HEADER_SIZE + n_frames * (8 + bmp_row_stride(width) * height)


def encode_avi(frames: np.ndarray, fps: int = _AVI_FPS, top_down: bool = True) -> bytes:
    """Encode an (n_frames, h, w, 3) uint8 RGB array as an uncompressed
    24-bit DIB AVI (RIFF 'AVI ', 'vids'/'DIB ' stream, one '00db' chunk
    per frame).

    Frames are stored like BMP pixel sections: B,G,R per pixel, rows
    padded to 4 bytes; ``top_down`` writes rows in image order with a
    negative strf height (valid for uncompressed DIBs, same convention
    as BMP), else bottom-up with a positive height. Fully vectorized."""
    nf, h, w, c = frames.shape
    if c != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_avi expects (n, h, w, 3) uint8 RGB")
    stride = bmp_row_stride(w)
    fsize = stride * h
    rows = np.zeros((nf, h, stride), dtype=np.uint8)
    rows[:, :, : w * 3] = frames[..., ::-1].reshape(nf, h, w * 3)  # RGB -> BGR
    if not top_down:
        rows = rows[:, ::-1]
    avih = struct.pack(
        "<4sI14I",
        b"avih",
        56,
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags
        nf,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        w,
        h,
        0,
        0,
        0,
        0,  # dwReserved[4]
    )
    strh = struct.pack(
        "<4sI4s4sIHHIIIIIIII4H",
        b"strh",
        56,
        b"vids",
        b"DIB ",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate
        0,  # dwStart
        nf,  # dwLength
        0,  # dwSuggestedBufferSize
        0,  # dwQuality
        0,  # dwSampleSize
        0,
        0,
        w & 0xFFFF,
        h & 0xFFFF,  # rcFrame
    )
    strf = struct.pack(
        "<4sIIiiHHIIiiII",
        b"strf",
        40,
        40,  # biSize
        w,
        -h if top_down else h,
        1,  # planes
        24,  # bpp
        0,  # BI_RGB
        fsize,
        0,
        0,  # x/y ppm
        0,
        0,  # clrUsed / clrImportant
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl
    frame_chunks = b"".join(
        b"00db" + struct.pack("<I", fsize) + rows[f].tobytes() for f in range(nf)
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(frame_chunks)) + b"movi" + frame_chunks
    body = b"AVI " + hdrl + movi
    out = b"RIFF" + struct.pack("<I", len(body)) + body
    assert len(out) == avi_file_size(w, h, nf)
    return out


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (chunk_id, body_start, body_size) walking a RIFF chunk run;
    validates declared sizes against the buffer (hostile-header safe)."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"truncated RIFF chunk {cid!r} (declares {size}, have {end - body})"
            )
        yield cid, body, size
        pos = body + size + (size & 1)  # word-aligned


def decode_avi(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit DIB AVI to (n_frames, h, w, 3) uint8
    RGB. General RIFF walk: finds strf inside LIST hdrl/strl wherever it
    sits, skips unknown chunks (JUNK, idx1, LIST INFO), accepts '00db'
    and '00dc' frame ids, and handles both row orders (strf height sign)
    and row padding. Validates every declared size against the buffer —
    corrupt headers raise ValueError, never over-read."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = min(len(data), 8 + riff_size)
    w = h_signed = bpp = compression = None
    frames_raw: list[bytes] = []

    def walk(pos: int, stop: int) -> None:
        nonlocal w, h_signed, bpp, compression
        for cid, body, size in _riff_chunks(data, pos, stop):
            if cid == b"LIST":
                walk(body + 4, body + size)  # skip the 4-byte list type
            elif cid == b"strf" and size >= 40 and w is None:
                _bi, w, h_signed = struct.unpack_from("<Iii", data, body)
                _planes, bpp = struct.unpack_from("<HH", data, body + 12)
                compression = struct.unpack_from("<I", data, body + 16)[0]
            elif cid in (b"00db", b"00dc"):
                frames_raw.append(data[body : body + size])

    walk(12, end)
    if w is None:
        raise ValueError("AVI missing strf header")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported AVI (bpp={bpp}, comp={compression})")
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError(f"invalid AVI frame dimensions {w}x{h_signed}")
    if not frames_raw:
        raise ValueError("AVI has no frame chunks")
    stride = bmp_row_stride(w)
    # validate EVERY frame length against the header dims BEFORE allocating
    # the output — absurd header dims must fail the size check, not OOM
    for f, raw in enumerate(frames_raw):
        if len(raw) < stride * h:
            raise ValueError(
                f"short AVI frame {f} ({len(raw)} bytes, need {stride * h})"
            )
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for f, raw in enumerate(frames_raw):
        rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h).reshape(h, stride)
        rows = rows[:, : w * 3]
        if h_signed > 0:  # bottom-up storage -> flip to image order
            rows = rows[::-1]
        out[f] = rows.reshape(h, w, 3)[..., ::-1]  # BGR -> RGB
    return out
