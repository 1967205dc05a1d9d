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

    Fully bulk-numpy accumulation: tokens flatten into one array, md5 runs
    ONCE per distinct token (memoized across Arrow batches), the per-token
    ±1 bit rows come from one broadcasted shift of the unique fingerprint
    vector, and per-doc sums are chunked ``np.add.at`` scatters — no
    Python statement executes per token occurrence.
    """

    bit_idx = np.arange(num_bits, dtype=np.uint64)
    # closure-level, so the cache survives across Arrow batches within a
    # worker (np.unique dedups within a batch; this dedups across them)
    memo: dict[str, int] = {}

    @F.pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        def token_val(tok: str) -> int:
            v = memo.get(tok)
            if v is None:
                v = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
                memo[tok] = v
            return v

        n = len(texts)
        tok_lists = [t.split() if t else [] for t in texts]
        counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
        flat = [tok for toks in tok_lists for tok in toks]
        out = np.zeros(n, dtype=np.int64)
        if flat:
            uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
            vals = np.fromiter(
                (token_val(t) for t in uniq), dtype=np.uint64, count=len(uniq)
            )
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
