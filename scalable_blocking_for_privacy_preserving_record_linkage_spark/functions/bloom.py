"""Bloom-filter (CLK) encoding and Dice similarity.

Semantics reproduced from the reference encoder
(/root/reference/src/main/java/com/utils/BloomAlgorithms.java:9-38 and
/root/reference/src/main/java/com/blooms/BloomFilter.java:28-68):

* value with raw length <= 1 (or null) -> empty filter
  (BloomAlgorithms.java:31);
* pad: ``'#' + value.strip() + '%'`` repeated ``q-1`` times
  (BloomAlgorithms.java:20-26);
* sliding q-grams (q=2) over the padded string (BloomAlgorithms.java:33-35);
* per gram: MD5 digest split into k=4 big-endian 4-byte words
  (BloomFilter.java:39-62, ``toLong`` big-endian at :14-22), each ``mod m``
  (m=3000) sets one bit.

Divergence (documented, SURVEY.md §2.8.5): the reference hashes with the
platform charset and uses *char* count as *byte* count — only correct for
ASCII. We define UTF-8 bytes explicitly; fixtures are ASCII-folded so golden
outputs agree.

Representation: a filter is a fixed-length ``array<bigint>`` of
``ceil(m/64)`` words; bit ``b`` lives in word ``b // 64`` at position
``b % 64``. This keeps the *matcher* entirely JVM-side: Dice is computed with
``zip_with`` + ``bit_count`` + ``aggregate`` (whole-stage codegen, no Python
in the pairwise hot path) — the scale-critical property at 10^12 candidates.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import PPRLConfig

# gram -> tuple of k bit positions; grams come from a small alphabet so this
# memo converges to a few thousand entries per executor and makes the encoder
# amortized-O(1) hashing per gram.
_GRAM_MEMO: dict[tuple[str, int, int], tuple[int, ...]] = {}
_GRAM_MEMO_CAP = 1_000_000


def gram_bit_positions(gram: str, m: int, k: int = 4) -> tuple[int, ...]:
    """k MD5-derived bit positions for one q-gram (BloomFilter.java:46-62)."""
    key = (gram, m, k)
    hit = _GRAM_MEMO.get(key)
    if hit is not None:
        return hit
    digest = hashlib.md5(gram.encode("utf-8")).digest()
    words = struct.unpack(">4I", digest)  # 4 big-endian uint32 words
    positions = tuple(int(w % m) for w in words[:k])
    if len(_GRAM_MEMO) < _GRAM_MEMO_CAP:
        _GRAM_MEMO[key] = positions
    return positions


def encode_value(value: str | None, cfg: PPRLConfig) -> list[int]:
    """Encode one attribute value into packed int64 words.

    Mirrors BloomAlgorithms.string2Bloom: the length>1 check is on the RAW
    value, the pad trims afterwards (BloomAlgorithms.java:21,31).
    """
    n_words = cfg.bloom_words
    words = [0] * n_words
    if value is None or len(value) <= 1:
        return words
    q = cfg.ngram_size
    padded = ("#" * (q - 1)) + value.strip() + ("%" * (q - 1))
    m = cfg.bloom_m
    k = cfg.hash_functions
    for i in range(len(padded) - q + 1):
        for b in gram_bit_positions(padded[i : i + q], m, k):
            words[b >> 6] |= 1 << (b & 63)
    # wrap to signed int64 (Spark LongType)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def encode_series(values: pd.Series, cfg: PPRLConfig) -> pd.Series:
    """Arrow-batched encoder: one pass over the batch's *unique* values."""
    uniques = pd.unique(values)
    table = {v: encode_value(v, cfg) for v in uniques}
    return values.map(table)


def bloom_udf(cfg: PPRLConfig):
    """pandas UDF: string column -> array<bigint> filter column."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _encode(values: pd.Series) -> pd.Series:
        return encode_series(values, cfg)

    return _encode


def sparse_positions_value(value: str | None, cfg: PPRLConfig) -> list[int]:
    """Encode one attribute value as its sorted distinct set-bit
    POSITIONS (the sparse CLK wire format; see
    ``PPRLConfig.bloom_representation``). Same gram/hash semantics as
    ``encode_value`` — the dense words are exactly the bitset of these
    positions (equivalence property test in tests/test_matching.py)."""
    if value is None or len(value) <= 1:
        return []
    q = cfg.ngram_size
    padded = ("#" * (q - 1)) + value.strip() + ("%" * (q - 1))
    m = cfg.bloom_m
    k = cfg.hash_functions
    positions: set[int] = set()
    for i in range(len(padded) - q + 1):
        positions.update(gram_bit_positions(padded[i : i + q], m, k))
    return sorted(positions)


def sparse_bloom_udf(cfg: PPRLConfig):
    """pandas UDF: string column -> array<smallint> of sorted set-bit
    positions (positions < bloom_m = 3000 fit int16 — 2 bytes per set
    bit on the Arrow wire and in the shuffle)."""
    assert cfg.bloom_m <= 32767, "sparse smallint positions need m < 2^15"

    @F.pandas_udf(T.ArrayType(T.ShortType()))
    def _encode(values: pd.Series) -> pd.Series:
        uniques = pd.unique(values)
        table = {
            v: np.asarray(sparse_positions_value(v, cfg), dtype=np.int16)
            for v in uniques
        }
        return values.map(table)

    return _encode


# ---------------------------------------------------------------------------
# Pure-Catalyst bitset math (matcher hot path — no Python)
# ---------------------------------------------------------------------------


def popcount_expr(filter_col: Column | str) -> Column:
    """Cardinality of a packed filter (sum of per-word bit_count)."""
    c = F.col(filter_col) if isinstance(filter_col, str) else filter_col
    return F.aggregate(c, F.lit(0), lambda acc, w: acc + F.bit_count(w))


def intersection_count_expr(f1: Column, f2: Column) -> Column:
    """popcount(f1 AND f2) — zip_with keeps it one codegen'd expression."""
    return F.aggregate(
        F.zip_with(f1, f2, lambda a, b: F.bit_count(a.bitwiseAND(b))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def sparse_card_expr(positions: Column | str) -> Column:
    """Cardinality of a sparse filter = its position count."""
    c = F.col(positions) if isinstance(positions, str) else positions
    return F.size(c)


def sparse_intersection_count_expr(p1: Column, p2: Column) -> Column:
    """|a AND b| for two sparse position arrays: the positions are
    distinct within each filter, so set-intersection size IS the
    bitset-AND popcount — one JVM ArrayIntersect per pair, no Python."""
    return F.size(F.array_intersect(p1, p2))


def dice_pass_expr(inter: Column, card1: Column, card2: Column, threshold: float) -> Column:
    """``2*|a∧b| / (|a|+|b|) >= t`` without division (exact for dyadic t).

    Guard: both-empty filters give Java ``0f/0`` = NaN, and ``NaN >= t`` is
    false (MetaBlocking.java:108-118) — hence the ``> 0`` conjunct.
    """
    denom = card1 + card2
    return (denom > F.lit(0)) & (
        F.lit(2.0) * inter.cast("double") >= F.lit(float(threshold)) * denom.cast("double")
    )


def dice_sim_expr(inter: Column, card1: Column, card2: Column) -> Column:
    """Reported Dice similarity (double); 0.0 when both filters are empty."""
    denom = (card1 + card2).cast("double")
    return F.when(denom > 0, F.lit(2.0) * inter.cast("double") / denom).otherwise(F.lit(0.0))
