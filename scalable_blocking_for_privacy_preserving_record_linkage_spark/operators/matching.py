"""Bloom-filter encoding of records and Dice matching of candidate pairs
(the reference's ``MetaBlocking.createBloomFilters`` / ``isMatch``,
/root/reference/src/main/java/com/algorithms/MetaBlocking.java:31-43,79-119).

Scale design:
* Encoding runs ONCE per record (pandas UDF over Arrow batches, memoized
  q-gram hashing) and materializes per-attribute filter cardinalities, so
  the per-PAIR work is join + pure-Catalyst bitset math only.
* The two attach-joins (pairs × AliceBlooms, pairs × BobBlooms,
  MetaBlocking.java:37-41) are plain shuffled equi-joins; the bloom side is
  repartitioned on the join key so AQE can coalesce/skew-split. On a real
  cluster the bloom table would be bucketed by recordID (SURVEY.md §2.3).
* ``isMatch`` becomes a whole-stage-codegen expression: per attribute
  ``2*|a∧b| >= t*(|a|+|b|)`` (division-free, exact for dyadic t) with the
  NaN-guard for empty filters; match iff >= ``matches_to_accept`` attributes
  pass (MetaBlocking.java:98-104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ShortType

from ..config import PPRLConfig
from ..functions import bloom


def encode_blooms(
    records: DataFrame, cfg: PPRLConfig, representation: str | None = None
) -> DataFrame:
    """(id, party, attr1..attrN, …) -> (recordID, party, bloom_i, card_i).

    One filter per blocking attribute (MetaBlocking.java:83-85); cardinality
    precomputed AT ENCODE TIME so the Dice denominator never recomputes
    per pair and only (bloom, card) rides the pair stream.

    ``representation`` (default ``cfg.bloom_representation``) picks the
    wire format: "dense" packed int64 words or "sparse" sorted smallint
    set-bit positions — identical match semantics, 3-6x fewer raw bytes
    per pair on the sparse stream for name-like attributes (see
    PPRLConfig.bloom_representation and the A/B in BENCH/BASELINE.md).
    Paths that consume the word layout itself (HLSH bit segments) pass
    representation="dense" explicitly.
    """
    rep = representation or cfg.bloom_representation
    udf = bloom.sparse_bloom_udf(cfg) if rep == "sparse" else bloom.bloom_udf(cfg)
    out = records.select(
        F.col(cfg.id_col).cast("string").alias("recordID"),
        "party",
        *[udf(F.col(a).cast("string")).alias(f"bloom_{i+1}") for i, a in enumerate(cfg.blocking_attrs)],
    )
    card = bloom.sparse_card_expr if rep == "sparse" else bloom.popcount_expr
    for i in range(cfg.num_attrs):
        out = out.withColumn(f"card_{i+1}", card(f"bloom_{i+1}"))
    return out


def _attach_blooms(pairs: DataFrame, blooms: DataFrame, cfg: PPRLConfig) -> DataFrame:
    """(record1, record2) × blooms -> the two attach-joins: record1 takes
    the Alice-side filters, record2 the Bob-side (MetaBlocking.java:37-41)."""
    blooms_a, blooms_b = split_blooms(blooms, cfg)
    if cfg.broadcast_blooms:
        blooms_a, blooms_b = F.broadcast(blooms_a), F.broadcast(blooms_b)
    return attach_blooms_presplit(pairs, blooms_a, blooms_b)


def split_blooms(blooms: DataFrame, cfg: PPRLConfig) -> tuple[DataFrame, DataFrame]:
    """Pre-split the bloom table into the two attach-join sides (Alice
    keyed as ``record1``, Bob as ``record2``) with the bloomA_*/bloomB_*
    column names ``score_joined`` expects.

    This is the projection to PERSIST as two bucketed catalog tables
    (Iceberg ``bucket(N, record1)`` / ``bucket(N, record2)``, or the
    parquet stand-in in ``sources/catalog.py``): each attach-join then
    reads co-located buckets and carries no Exchange on the bloom side —
    only the candidate-pair stream shuffles. ``attach_blooms_presplit``
    consumes the reread tables; plan gate in tests/test_plans.py."""
    n = cfg.num_attrs
    blooms_a = blooms.where(F.col("party") == "A").select(
        F.col("recordID").alias("record1"),
        *[F.col(f"bloom_{i+1}").alias(f"bloomA_{i+1}") for i in range(n)],
        *[F.col(f"card_{i+1}").alias(f"cardA_{i+1}") for i in range(n)],
    )
    blooms_b = blooms.where(F.col("party") == "B").select(
        F.col("recordID").alias("record2"),
        *[F.col(f"bloom_{i+1}").alias(f"bloomB_{i+1}") for i in range(n)],
        *[F.col(f"card_{i+1}").alias(f"cardB_{i+1}") for i in range(n)],
    )
    return blooms_a, blooms_b


def attach_blooms_presplit(
    pairs: DataFrame, blooms_a: DataFrame, blooms_b: DataFrame
) -> DataFrame:
    """The two attach-joins against pre-split (typically bucketed-table)
    bloom sides from ``split_blooms`` — same join shape as
    ``_attach_blooms`` minus the per-run party filter/rename."""
    return pairs.join(blooms_a, "record1", "inner").join(blooms_b, "record2", "inner")


def match_candidates(
    pairs: DataFrame,
    blooms: DataFrame,
    cfg: PPRLConfig,
    keep_similarities: bool = False,
) -> DataFrame:
    """(record1, record2) × blooms -> matched pairs."""
    return score_joined(_attach_blooms(pairs, blooms, cfg), cfg, keep_similarities)


def match_stats(pairs: DataFrame, blooms: DataFrame, cfg: PPRLConfig) -> DataFrame:
    """One-row (n_candidates, n_matches) aggregate in a SINGLE pass over
    the scored join — the throughput-measurement shape: candidate count
    and match count come out of one action with no intermediate
    checkpoint and no second traversal of the pair stream. Used by the
    scaling bench; agrees with ``pairs.count()`` /
    ``match_candidates(...).count()`` by construction (unit-tested)."""
    scored = score_joined(_attach_blooms(pairs, blooms, cfg), cfg, unfiltered=True)
    return scored.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.count(
            F.when(F.col("matched_fields") >= cfg.matches_to_accept, 1)
        ).alias("n_matches"),
    )


def score_joined(
    joined: DataFrame,
    cfg: PPRLConfig,
    keep_similarities: bool = False,
    unfiltered: bool = False,
) -> DataFrame:
    """Dice-score a frame that already carries (record1, record2,
    bloomA_i/cardA_i, bloomB_i/cardB_i) — shared by the batch join path
    and the stream-static path (streaming/jobs.py)."""
    n = cfg.num_attrs
    passes = []
    sims = []
    # dispatch on the ACTUAL column type, not cfg: a frame encoded with an
    # explicit representation= override scores correctly regardless
    sparse = isinstance(
        joined.schema["bloomA_1"].dataType.elementType, ShortType
    )
    inter_expr = (
        bloom.sparse_intersection_count_expr
        if sparse
        else bloom.intersection_count_expr
    )
    for i in range(1, n + 1):
        inter = inter_expr(F.col(f"bloomA_{i}"), F.col(f"bloomB_{i}"))
        passes.append(
            bloom.dice_pass_expr(
                inter, F.col(f"cardA_{i}"), F.col(f"cardB_{i}"), cfg.matching_threshold
            ).cast("int")
        )
        if keep_similarities:
            sims.append(
                bloom.dice_sim_expr(
                    inter, F.col(f"cardA_{i}"), F.col(f"cardB_{i}")
                ).alias(f"dice_{i}")
            )

    matched_fields = sum(passes[1:], passes[0]).alias("matched_fields")
    result = joined.select("record1", "record2", matched_fields, *sims)
    if unfiltered:
        return result
    return result.where(F.col("matched_fields") >= cfg.matches_to_accept)
