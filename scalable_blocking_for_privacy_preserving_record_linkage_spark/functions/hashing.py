"""Hash-family expressions: MD5-derived integer hashes, MinHash, SimHash.

Everything that feeds a DuckDB oracle is pure Catalyst with an exact SQL
twin (md5 hex -> first 8 hex chars -> bigint). SimHash needs per-bit
accumulation and is implemented as a vectorized pandas UDF.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import qgrams_expr, tokens_expr


def md5_int_expr(s: Column) -> Column:
    """First 8 hex chars of md5(s) as a bigint in [0, 2^32).

    SQL twin (DuckDB): ``('0x' || substr(md5(s), 1, 8))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


# prime just above 2^32; affine constants keep A*base + B < 2^37 « int64
MINHASH_PRIME = 4294967311


def minhash_a(h: int) -> int:
    return 2 * h + 1


def minhash_b(h: int) -> int:
    return (h * 2654435761) % MINHASH_PRIME


def minhash_base_expr(text: Column, shingle_q: int) -> Column:
    """array<bigint> of ONE md5-derived base hash per DISTINCT shingle.

    The expensive digest runs once per distinct q-gram; the ``num_hashes``
    MinHash values are cheap affine transforms of these bases
    (``minhash_from_bases_expr``). Project this into its own column before
    fanning out — Catalyst will not collapse the projection because the
    higher-order transform is non-cheap, so the digests are not recomputed
    per hash function.
    """
    return F.transform(F.array_distinct(qgrams_expr(text, shingle_q)), md5_int_expr)


def minhash_from_bases_expr(bases: Column, num_hashes: int) -> Column:
    """sig[h] = min over shingles of (A_h * base + B_h) mod P.

    Classic universal-hash MinHash (Broder): a single strong base hash per
    shingle plus per-function affine maps — 8× fewer digests than hashing
    every (h, shingle) pair, identical collision behavior for LSH.
    SQL twin: ``min((a*base + b) % 4294967311)`` over the same base hashes.
    """
    def affine(h: int):
        # must stay a ONE-argument lambda — a second (defaulted) param would
        # make pyspark's transform() pass the array index into it
        a, c = minhash_a(h), minhash_b(h)
        return lambda b: (b * a + c) % MINHASH_PRIME

    return F.array(
        *[F.array_min(F.transform(bases, affine(h))) for h in range(num_hashes)]
    )


def minhash_bands_expr(sig: Column, num_bands: int, rows_per_band: int) -> Column:
    """LSH banding: array of (band_idx, band_signature_string) structs.

    Documents sharing any band signature become near-dup candidates via a
    plain equi-join on (band, band_sig) — the classic shuffle-friendly LSH.
    """
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(sig, b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                ).alias("band_sig"),
            )
            for b in range(num_bands)
        ]
    )


# --- vectorized single-block MD5 (RFC 1321), numpy across all inputs ---
# Per-round constants: K = floor(abs(sin(i+1)) * 2^32), left-rotate
# amounts, and the message-word schedule g(i). Standard MD5; the only
# novelty is that A/B/C/D are (U,)-shaped uint32 ARRAYS, so the 64 rounds
# run once per BATCH of tokens, not once per token.
_MD5_K = np.array(
    [int(abs(math.sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_MD5_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_MD5_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)


def _md5_prefix64_block(blocks: np.ndarray) -> np.ndarray:
    """uint64 big-endian first-8-digest-bytes of md5 over (U, 64) padded
    single blocks — bit-identical to hashlib.md5 for messages <= 55 bytes.
    64 vectorized rounds total; zero Python statements per message.

    Measured honestly: per DISTINCT token this is ~2.5x SLOWER than a
    hashlib loop (OpenSSL's assembler MD5 is ~0.5us/token; 64 numpy
    rounds cost ~1.4us/token at batch vocab sizes) — the win is bounded
    worker memory (no cross-batch memo) and no per-token Python object
    churn, and at query level the delta is invisible: dedup_simhash at
    sf0.1 measured 1.61s vs 1.58s before (within run-to-run noise)."""
    u8 = blocks.reshape(-1, 16, 4).astype(np.uint32)
    # (16, U) so each round's message word m[g] is a CONTIGUOUS row gather
    m = np.ascontiguousarray(
        (u8[:, :, 0] | (u8[:, :, 1] << 8) | (u8[:, :, 2] << 16) | (u8[:, :, 3] << 24)).T
    )
    n = blocks.shape[0]
    a = np.full(n, 0x67452301, dtype=np.uint32)
    b = np.full(n, 0xEFCDAB89, dtype=np.uint32)
    c = np.full(n, 0x98BADCFE, dtype=np.uint32)
    d = np.full(n, 0x10325476, dtype=np.uint32)
    f = np.empty(n, dtype=np.uint32)
    t = np.empty(n, dtype=np.uint32)
    for i in range(64):
        # round function into preallocated f/t (no per-round allocations)
        if i < 16:
            np.bitwise_xor(c, d, out=f)
            np.bitwise_and(f, b, out=f)
            np.bitwise_xor(f, d, out=f)  # (b&c)|(~b&d) == d ^ (b & (c^d))
        elif i < 32:
            np.bitwise_xor(b, c, out=f)
            np.bitwise_and(f, d, out=f)
            np.bitwise_xor(f, c, out=f)  # (d&b)|(~d&c) == c ^ (d & (b^c))
        elif i < 48:
            np.bitwise_xor(b, c, out=f)
            np.bitwise_xor(f, d, out=f)
        else:
            np.bitwise_or(b, ~d, out=f)
            np.bitwise_xor(f, c, out=f)
        f += a
        f += _MD5_K[i]
        f += m[_MD5_G[i]]
        a, d, c, b = d, c, b, a  # rotate registers; old `a` becomes scratch `b`
        s = int(_MD5_S[i])
        np.right_shift(f, np.uint32(32 - s), out=t)
        np.left_shift(f, np.uint32(s), out=f)
        np.bitwise_or(f, t, out=f)
        np.add(f, c, out=b)  # b_new = old_c(+rot) ... == c + rotl(f, s)
    a += np.uint32(0x67452301)
    b += np.uint32(0xEFCDAB89)
    a, b = a.byteswap(), b.byteswap()  # digest is little-endian
    return (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)


def _md5_prefix64_tokens(uniq: np.ndarray) -> np.ndarray:
    """int.from_bytes(md5(tok.encode()).digest()[:8], 'big') for an object
    array of (NUL-free) unique token strings — vectorized: numpy encodes
    to a fixed-width byte matrix, MD5 padding is array arithmetic, and the
    digest rounds run batch-wide. Tokens whose UTF-8 form exceeds the
    55-byte single-block limit fall back to hashlib (rare tail)."""
    enc = np.char.encode(uniq.astype("U"), "utf-8")  # 'S' dtype, NUL-padded
    lens = np.char.str_len(enc).astype(np.int64)
    width = enc.dtype.itemsize
    vals = np.zeros(len(uniq), dtype=np.uint64)
    short = lens <= 55
    if short.any():
        sel = enc[short]
        slens = lens[short]
        blocks = np.zeros((len(sel), 64), dtype=np.uint8)
        # width is the max byte length over ALL uniq tokens (long ones
        # included); selected rows carry <=55 real bytes + NUL padding
        w = min(width, 56)
        blocks[:, :w] = sel.view(np.uint8).reshape(len(sel), width)[:, :w]
        blocks[np.arange(len(sel)), slens] = 0x80
        bitlen = (slens.astype(np.uint64) * np.uint64(8))[:, None]
        blocks[:, 56:64] = (bitlen >> (np.arange(8, dtype=np.uint64) * np.uint64(8))).astype(np.uint8)
        vals[short] = _md5_prefix64_block(blocks)
    if not short.all():
        for j in np.nonzero(~short)[0]:
            vals[j] = int.from_bytes(
                hashlib.md5(str(uniq[j]).encode("utf-8")).digest()[:8], "big"
            )
    return vals


def simhash_udf(num_bits: int = 64):
    """SimHash over whitespace tokens (vectorized pandas UDF).

    Per token: 64-bit md5-derived fingerprint; per bit: +1 if set else -1,
    summed over tokens; simhash bit = sign. Returns bigint.

    Fully bulk-numpy: tokens flatten into one array, the md5 fingerprints
    of the distinct tokens come from a BATCH-VECTORIZED single-block MD5
    (``_md5_prefix64_tokens`` — 64 numpy rounds per batch, hashlib only
    for >55-byte tokens), the per-token ±1 bit rows come from one
    broadcasted shift of the unique fingerprint vector, and per-doc sums
    are chunked ``np.add.at`` scatters — no Python statement executes per
    token occurrence OR per distinct token, and no cross-batch state
    accumulates in the worker."""

    bit_idx = np.arange(num_bits, dtype=np.uint64)

    @F.pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        n = len(texts)
        # NUL bytes defeat numpy's fixed-width ('S'/'U') encode (trailing
        # NULs are stripped on item access); detect them VECTORIZED at the
        # document level — if no document contains one, no token does.
        has_nul = bool(texts.str.contains("\x00", regex=False).fillna(False).any())
        tok_lists = [t.split() if t else [] for t in texts]
        counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
        flat = [tok for toks in tok_lists for tok in toks]
        out = np.zeros(n, dtype=np.int64)
        if flat:
            uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
            if has_nul:  # scalar fallback for the whole batch (rare)
                vals = np.fromiter(
                    (
                        int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
                        for t in uniq
                    ),
                    dtype=np.uint64,
                    count=len(uniq),
                )
            else:
                vals = _md5_prefix64_tokens(uniq)
            # (U, num_bits) rows of ±1 — one per DISTINCT token
            pm1 = (
                ((vals[:, None] >> bit_idx[None, :]) & 1).astype(np.int16) * 2 - 1
            )
            doc_idx = np.repeat(np.arange(n), counts)
            acc = np.zeros((n, num_bits), dtype=np.int64)
            chunk = 1 << 17  # bound the (tokens, num_bits) gather to ~16 MB
            for s in range(0, len(doc_idx), chunk):
                np.add.at(acc, doc_idx[s : s + chunk], pm1[inv[s : s + chunk]])
            packed = (
                ((acc > 0).astype(np.uint64) << bit_idx[None, :])
                .sum(axis=1, dtype=np.uint64)
                .view(np.int64)
            )
            out = np.where(counts > 0, packed, 0)
        return pd.Series(out)

    return _simhash


def hamming64_expr(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (pure Catalyst)."""
    return F.bit_count(a.bitwiseXOR(b))
