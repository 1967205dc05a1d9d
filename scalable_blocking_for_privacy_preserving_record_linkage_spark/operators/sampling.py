"""Deterministic corpus sampling for training-data mixture weighting.

A pre-training build rarely takes domains/languages at their natural
rates — it up/down-weights strata ("webtext 0.6x, code 2x, wiki 3x").
``weighted_sample`` implements the standard scalable form: a per-stratum
Bernoulli keep-decision driven by a SEEDED HASH of the row id, not an
RNG — so the sample is exactly reproducible, independent of
partitioning/execution order, stable under reruns (a row's fate never
changes when the corpus grows), and SQL-twinnable for the DuckDB
oracle. Pure Catalyst projection: no shuffle, no UDF, no state.

``spark.DataFrame.sample`` is NOT this: it draws per-partition from an
RNG stream, so the selected set changes with partitioning and cannot be
value-checked or replayed per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_int_expr

_U32 = float(1 << 32)


def sample_uniform_expr(id_col: Column, seed: int) -> Column:
    """Deterministic uniform [0, 1) draw per id: md5-derived 32-bit
    integer of ``"{seed}|{id}"`` scaled by 2^-32.

    SQL twin (DuckDB):
    ``('0x' || substr(md5(seed || '|' || id), 1, 8))::BIGINT / 4294967296.0``.
    """
    return md5_int_expr(
        F.concat(F.lit(f"{seed}|"), id_col.cast("string"))
    ) / F.lit(_U32)


def weighted_sample(
    docs: DataFrame,
    rates: dict[str, float],
    key_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with probability ``rates[key]`` (``default_rate``
    for unlisted strata), decided by the seeded per-id hash draw.

    Rates above 1.0 are clamped to keep-all (``weighted_repeat`` handles
    upsampling). Returns the input columns unchanged, filtered.
    """
    rate_expr = _rate_expr(rates, key_col, default_rate)
    return docs.where(sample_uniform_expr(F.col(id_col), seed) < rate_expr)


def _rate_expr(rates: dict[str, float], key_col: str, default_rate: float) -> Column:
    rate_expr: Column = F.lit(float(default_rate))
    for k, r in sorted(rates.items()):
        rate_expr = F.when(F.col(key_col) == k, F.lit(float(r))).otherwise(rate_expr)
    return rate_expr


def weighted_repeat(
    docs: DataFrame,
    rates: dict[str, float],
    key_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_rate: float = 1.0,
) -> DataFrame:
    """Fractional up/down-sampling: each row appears
    ``floor(rate) + Bernoulli(rate - floor(rate))`` times (so rate 2.25
    means every row twice plus a deterministic quarter of rows a third
    time), with a ``copy_idx`` column (1-based) distinguishing the
    repeats. The fractional draw reuses the seeded per-id hash —
    reproducible and partition-invariant like ``weighted_sample``; a
    rate <= 1.0 degrades to exactly its Bernoulli thinning.

    Prefer DYADIC rates (k/2^n: 0.25, 1.5, 2.75 …) so the fractional
    comparison is exact under IEEE doubles in both Spark and the DuckDB
    oracle.

    Scale shape: pure projection + explode — no shuffle; the output is
    at most ``ceil(max rate)`` times the input, never quadratic.
    """
    rate_expr = _rate_expr(rates, key_col, default_rate)
    whole = F.floor(rate_expr).cast("long")
    frac = rate_expr - F.floor(rate_expr)
    extra = (sample_uniform_expr(F.col(id_col), seed) < frac).cast("long")
    n = (whole + extra).alias("_n_copies")
    return (
        docs.withColumn("_n_copies", n)
        .where(F.col("_n_copies") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1).cast("long"), F.col("_n_copies"))))
        .drop("_n_copies")
    )


def pack_into_blocks(
    docs: DataFrame,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    block_tokens: int = 2048,
    num_shards: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Deterministic distributed SEQUENCE PACKING — the layout step a
    pre-training build runs after cleaning: documents are concatenated
    into one token stream per shard and cut into fixed ``block_tokens``
    windows (GPT-style packing, where a document may straddle a block
    boundary). Returns one row per doc: (id, shard, start_offset,
    first_block, blocks_spanned).

    Scale shape for 10^12 docs: a single global running sum would funnel
    one window task, so docs are salted into ``num_shards`` INDEPENDENT
    streams by the seeded md5 of the id (same reproducible-hash
    convention as ``weighted_sample``: partition-invariant, rerun-
    stable, SQL-twinnable), ordered within a shard by (md5-hex, id) —
    a total order — and the running token sum is a window partitioned
    by shard: num_shards parallel cumsums, each a single sort-free pass
    after the shuffle. On a cluster, set num_shards ~ total cores so
    every executor packs its own stream, exactly how multi-worker data
    loaders shard packing in practice.
    """
    okey = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    shard = (md5_int_expr(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
             % num_shards).cast("int")
    staged = docs.select(
        F.col(id_col),
        F.col(token_count_col).cast("long").alias("_nt"),
        okey.alias("_okey"),
        shard.alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("_nt").over(w)
    start = (cum - F.col("_nt")).alias("start_offset")
    first_block = F.floor((cum - F.col("_nt")) / block_tokens).cast("long")
    # last token of the doc sits at cum-1; empty docs span their start block
    last_block = F.floor(
        F.greatest(cum - 1, cum - F.col("_nt")) / block_tokens
    ).cast("long")
    return staged.select(
        F.col(id_col),
        "shard",
        start,
        first_block.alias("first_block"),
        (last_block - first_block + 1).alias("blocks_spanned"),
    )
