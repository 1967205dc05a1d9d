"""Hash-family expressions: MD5-derived integer hashes, MinHash, SimHash.

Everything that feeds a DuckDB oracle is pure Catalyst with an exact SQL
twin (md5 hex -> first 8 hex chars -> bigint). SimHash needs per-bit
accumulation and is implemented as a vectorized pandas UDF.
"""

from __future__ import annotations

import hashlib

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


def simhash_udf(num_bits: int = 64):
    """SimHash over whitespace tokens (vectorized pandas UDF).

    Per token: 64-bit md5-derived fingerprint; per bit: +1 if set else -1,
    summed over tokens; simhash bit = sign. Returns bigint.
    """

    @F.pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        memo: dict[str, np.ndarray] = {}

        def token_bits(tok: str) -> np.ndarray:
            hit = memo.get(tok)
            if hit is None:
                d = hashlib.md5(tok.encode("utf-8")).digest()[:8]
                v = int.from_bytes(d, "big")
                hit = np.array([(v >> b) & 1 for b in range(num_bits)], dtype=np.int64)
                memo[tok] = hit
            return hit

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            toks = t.split()
            if not toks:
                continue
            acc = np.zeros(num_bits, dtype=np.int64)
            for tok in toks:
                acc += token_bits(tok) * 2 - 1
            bits = (acc > 0).astype(np.uint64)
            v = 0
            for b in range(num_bits):
                v |= int(bits[b]) << b
            out[i] = v - (1 << 64) if v >= (1 << 63) else v
        return pd.Series(out)

    return _simhash


def hamming64_expr(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (pure Catalyst)."""
    return F.bit_count(a.bitwiseXOR(b))
