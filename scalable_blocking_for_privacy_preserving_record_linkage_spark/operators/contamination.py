"""Benchmark decontamination: token n-gram overlap against an eval set.

The standard pre-training hygiene pass: a corpus document is
contaminated when it shares at least ``min_hits`` distinct token
n-grams (n=13 is the common setting) with any benchmark/eval document.

Scale shape: the benchmark side is distinct n-gram HASHES only —
(#benchmark-docs x ~tokens) int64 rows, tiny next to the corpus — so
Spark broadcasts it and the corpus-side explode never shuffles; with a
huge eval suite the same plan degrades gracefully to a shuffled
equi-join on an 8-byte key. The corpus is scanned once; nothing
pairwise ever materializes.

Grams are xxhash64 images of the space-joined token window (integer
equality; collisions ~1e-13, see operators/dedup.py for the same
argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources.io import ensure_parallelism


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int):
    # gram construction is CPU-heavy per row (token window x concat x
    # hash); a single-file local scan would otherwise run it on one task
    df = ensure_parallelism(df)
    toks = tokens_expr(F.col(text_col))
    grams = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(F.transform(grams, lambda g: F.xxhash64(g))).alias("_hg"),
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
    broadcast_benchmark: bool = False,
) -> DataFrame:
    """One row per corpus doc: (doc_id, total_grams, n_hits, contaminated).

    ``total_grams`` counts the doc's DISTINCT token n-grams; ``n_hits``
    how many of them appear anywhere in the benchmark; ``contaminated``
    is the ``n_hits >= min_hits`` drop verdict. Docs shorter than one
    n-gram report 0/0/false.

    ``broadcast_benchmark``: False (default) leaves the join strategy to
    Catalyst/AQE — a typical eval suite's distinct grams fit the
    broadcast threshold and AQE picks a broadcast join at runtime, while
    a huge benchmark degrades gracefully to a shuffled equi-join instead
    of slamming into the 8 GB broadcast limit. True forces the hint for
    cases where the optimizer under-estimates (e.g. an un-analyzed view
    over a known-small suite).
    """
    bench_grams = (
        _gram_hashes(benchmark, id_col, text_col, n)
        .select(F.explode("_hg").alias("gram"))
        .distinct()
    )
    corpus_grams = _gram_hashes(corpus, id_col, text_col, n)
    exploded = corpus_grams.select(
        "id", F.size("_hg").alias("total_grams"), F.explode_outer("_hg").alias("gram")
    )
    bench_side = bench_grams.withColumn("_hit", F.lit(1))
    if broadcast_benchmark:
        bench_side = F.broadcast(bench_side)
    hits = exploded.join(bench_side, "gram", "left_outer")
    return (
        hits.groupBy("id", "total_grams")
        .agg(F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hits"))
        .select(
            F.col("id").alias(id_col),
            F.col("total_grams").cast("long").alias("total_grams"),
            "n_hits",
            (F.col("n_hits") >= min_hits).cast("int").alias("contaminated"),
        )
    )
