"""Hamming-LSH (HLSH) blocking over Bloom-filter segments — the
north-star's multi-pass LSH scheme (BASELINE.json ``north_star``), an
alternative blocking path to the reference-set classification the
reference uses (both feed the same Dice matcher).

Scheme (Durham et al., composite Bloom filter PPRL): per pass ``p``, a
seeded sample of ``bits_per_key`` bit positions is drawn from the
record's concatenated CLK segments; the extracted bits form the pass's
blocking key. Records agreeing on all sampled bits collide; similar
records (small Hamming distance) collide in at least one of the
``num_passes`` passes with high probability. Every pass is a pure
Catalyst projection (shift/mask on the packed int64 words — no Python),
and candidates come from one cross-party equi-join on (pass, key).

Collision probability for Hamming distance d over m bits:
P(one pass) = (1 - d/m)^bits_per_key, P(any) = 1 - (1-P)^num_passes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PPRLConfig


def _bit_expr(cols: list[str], pos: int, m: int, sparse: bool = False):
    """Bit ``pos`` of the virtual concatenation of per-attribute filters.

    Dense layout (array<bigint> of ceil(m/64) words): word shift + mask.
    Sparse layout (array<smallint> of sorted set-bit positions, see
    PPRLConfig.bloom_representation): membership test — same bit, same
    key, either wire format."""
    seg, off = divmod(pos, m)
    if sparse:
        return F.array_contains(
            F.col(cols[seg]), F.lit(off).cast("smallint")
        ).cast("int")
    word, bit = divmod(off, 64)
    return (
        F.shiftrightunsigned(F.element_at(F.col(cols[seg]), word + 1), bit)
        .bitwiseAND(F.lit(1))
    )


def hlsh_keys(
    blooms: DataFrame,
    cfg: PPRLConfig,
    num_passes: int = 8,
    bits_per_key: int = 16,
    seed: int | None = None,
) -> DataFrame:
    """(recordID, party, bloom_i...) -> (pass, key, recordID, party).

    One row per record per pass; ``key`` packs the sampled bits into a
    bigint. The (pass, positions) table is seeded and tiny — it lives in
    the plan as literals, no broadcast needed.
    """
    seed = cfg.seed if seed is None else seed
    n = cfg.num_attrs
    m = cfg.bloom_m
    # key packs bits_per_key bits into ONE signed bigint via shiftleft —
    # >= 64 would silently wrap and collapse distinct keys into shared
    # buckets (candidate inflation with no error)
    if not (1 <= bits_per_key <= 63):
        raise ValueError(f"bits_per_key must be in [1, 63], got {bits_per_key}")
    if bits_per_key > n * m:
        raise ValueError(
            f"bits_per_key={bits_per_key} exceeds total filter bits {n * m}"
        )
    cols = [f"bloom_{i+1}" for i in range(n)]
    from pyspark.sql.types import ShortType

    sparse = isinstance(blooms.schema[cols[0]].dataType.elementType, ShortType)
    rng = np.random.default_rng(seed * 1_000 + 77)
    passes = []
    for p in range(num_passes):
        positions = rng.choice(n * m, size=bits_per_key, replace=False)
        key = F.lit(0).cast("bigint")
        for j, pos in enumerate(sorted(int(x) for x in positions)):
            key = key + F.shiftleft(
                _bit_expr(cols, pos, m, sparse).cast("bigint"), j
            )
        passes.append(F.struct(F.lit(p).alias("pass"), key.alias("key")))
    return blooms.select(
        "recordID",
        "party",
        F.explode(F.array(*passes)).alias("pk"),
    ).select(
        F.col("pk.pass").alias("pass"), F.col("pk.key").alias("key"), "recordID", "party"
    )


def hlsh_candidate_pairs(
    blooms: DataFrame,
    cfg: PPRLConfig,
    num_passes: int = 8,
    bits_per_key: int = 16,
    seed: int | None = None,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Cross-party candidate pairs from HLSH bucket collisions.

    (record1 = Alice id, record2 = Bob id, distinct.) ``max_bucket_size``
    purges degenerate buckets (e.g. the all-zeros key from empty
    filters) — the same skew guard as block purging.
    """
    keys = hlsh_keys(blooms, cfg, num_passes, bits_per_key, seed)
    if max_bucket_size is not None:
        # slim count-aggregate + left_semi join (NOT a window): the purge
        # exists precisely for degenerate hot buckets (e.g. the all-zeros
        # key), and a window would co-locate such a bucket on one task
        # before dropping it — the aggregate never does
        keep = (
            keys.groupBy("pass", "key")
            .count()
            .where(F.col("count") <= max_bucket_size)
            .select("pass", "key")
        )
        keys = keys.join(keep, ["pass", "key"], "left_semi")
    a = keys.where(F.col("party") == "A").select(
        "pass", "key", F.col("recordID").alias("record1")
    )
    b = keys.where(F.col("party") == "B").select(
        "pass", "key", F.col("recordID").alias("record2")
    )
    return (
        a.join(b, ["pass", "key"])
        .select("record1", "record2")
        .dropDuplicates(["record1", "record2"])
    )
