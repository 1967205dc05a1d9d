"""Document deduplication operators for training-data pipelines.

Five families, each scale-shaped for 10^12 documents:

* exact          — hash groupBy (one slim shuffle on the digest)
* minhash + LSH  — shingle -> signature -> band -> bucket equi-join; the
                   candidate join is on (band, band_sig), never all-pairs
* simhash        — 64-bit fingerprint; near-dups = hamming <= k within
                   LSH buckets (bit-chunk banding)
* n-gram Jaccard — explode q-grams -> inverted-index self-join -> agg;
                   bounded by a shared-gram prefilter
* embedding      — cosine near-dup inside coarse buckets (see similarity)

All candidate generation is equi-join shaped (shuffle-friendly, AQE/skew
compatible); nothing materializes the quadratic pair space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing
from ..functions.text import qgrams_expr
from ..sources.io import ensure_parallelism


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group by content digest: (text_hash, n_docs, canonical_id)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_q: int = 5,
) -> DataFrame:
    bases = ensure_parallelism(docs).select(
        F.col(id_col),
        hashing.minhash_base_expr(F.col(text_col), shingle_q).alias("_bases"),
    )
    return bases.select(
        F.col(id_col),
        hashing.minhash_from_bases_expr(F.col("_bases"), num_hashes).alias("signature"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    num_bands: int = 4,
    shingle_q: int = 5,
) -> DataFrame:
    """Near-dup candidate pairs via LSH banding (id1 < id2, distinct).

    Scale shape: explode to (band, band_sig, id), self-equi-join on the
    band key — collisions only; hot buckets are bounded because identical
    band_sigs imply near-identical text.
    """
    rows = num_hashes // num_bands
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_q)
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.explode(
            hashing.minhash_bands_expr(F.col("signature"), num_bands, rows)
        ).alias("b"),
    ).select("id", F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )


def simhash_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return docs.select(
        F.col(id_col), hashing.simhash_udf()(F.col(text_col)).alias("simhash")
    )


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    num_chunks: int = 4,
) -> DataFrame:
    """SimHash near-dups: band the 64-bit hash into ``num_chunks`` 16-bit
    chunks — any pair within hamming <= num_chunks*? shares at least one
    chunk by pigeonhole when hamming < num_chunks; join on (chunk_idx,
    chunk_value), then verify exact hamming <= max_hamming (Catalyst
    bit_count). Never an all-pairs comparison.
    """
    sims = simhash_table(ensure_parallelism(docs), id_col, text_col)
    bits_per = 64 // num_chunks
    mask = (1 << bits_per) - 1
    chunks = sims.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * bits_per)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(num_chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id1"),
            F.col("r.id").alias("id2"),
            F.col("l.simhash").alias("h1"),
            F.col("r.simhash").alias("h2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    return cand.where(
        hashing.hamming64_expr(F.col("h1"), F.col("h2")) <= max_hamming
    ).select("id1", "id2", hashing.hamming64_expr(F.col("h1"), F.col("h2")).alias("hamming"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    q: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Character q-gram Jaccard similarity via inverted-index self-join.

    |A∩B| comes from the gram-level equi-join (count of shared DISTINCT
    grams), |A∪B| = |A|+|B|-|A∩B|; only pairs sharing >= 1 gram ever
    materialize. Output: (id1, id2, jaccard rounded to 4).
    """
    grams = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(qgrams_expr(F.col(text_col), q))).alias("gram"),
    )
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    l, r = grams.alias("l"), grams.alias("r")
    inter = (
        l.join(r, (F.col("l.gram") == F.col("r.gram")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("n_grams", "n1"), "id1")
        .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("n_grams", "n2"), "id2")
        .select(
            "id1",
            "id2",
            F.round(
                F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
