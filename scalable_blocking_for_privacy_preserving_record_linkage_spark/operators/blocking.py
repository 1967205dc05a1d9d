"""Block-ID construction and block assembly (phase 1b/1c of the reference).

* ``block_ids`` reproduces ``createBlockIDs``
  (/root/reference/src/main/java/com/algorithms/ReferenceSetBlocking.java:209-236)
  as a PURE CATALYST expression (array_sort + transform + explode): cyclic
  adjacent pairing of a record's classIDs, blockID = lexicographically
  ordered ``"{c_i}-{c_(i+1 mod n)}"``, score = score_i + score_(i+1 mod n).
  The reference pairs entries in nondeterministic ``collect_list`` order
  (SURVEY.md §2.8.1); we sort by sample index ``s`` first — the intended
  S1-S2, S2-S3, …, S12-S1 pairing, made deterministic.

* ``purge_blocks`` is the meta-blocking block-purge the north star requires
  (the reference has only the implicit both-parties purge of its inner join,
  ReferenceSetBlocking.java:120-122). It is computed as a slim
  count-aggregate + semi-join so hot blockIDs (duplicate boilerplate pages)
  are dropped BEFORE any wide rows or arrays materialize — this is the skew
  guard for the 10^12-scale shuffle.

* ``assemble_blocks`` reproduces the reference's per-block sorted element
  arrays (ReferenceSetBlocking.java:96-134,187-207) for inspection /
  checkpointing; the candidate-pair generator itself consumes the flat
  element stream (one fewer shuffle).

Total order within a block is (score, party, recordID) — the reference's
Bob-first stable tiebreak (ReferenceSetBlocking.java:196-205) is
nondeterministic under Spark shuffles, so we define a total one
(documented divergence, SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PPRLConfig


def block_ids(classified: DataFrame, cfg: PPRLConfig) -> DataFrame:
    """(recordID, party, s, classID, score) -> (blockID, recordID, party, score).

    One shuffle (groupBy recordID); the cyclic pairing itself is narrow.
    """
    grouped = classified.groupBy("recordID", "party").agg(
        F.array_sort(F.collect_list(F.struct("s", "classID", "score"))).alias("arr")
    )
    n = F.size(F.col("arr"))
    paired = grouped.select(
        "recordID",
        "party",
        F.explode(
            F.transform(
                F.col("arr"),
                lambda e, i: F.struct(
                    F.concat_ws(
                        "-",
                        F.least(
                            e["classID"],
                            F.element_at(F.col("arr"), ((i + 1) % n) + 1)["classID"],
                        ),
                        F.greatest(
                            e["classID"],
                            F.element_at(F.col("arr"), ((i + 1) % n) + 1)["classID"],
                        ),
                    ).alias("blockID"),
                    (
                        e["score"]
                        + F.element_at(F.col("arr"), ((i + 1) % n) + 1)["score"]
                    ).alias("score"),
                ),
            )
        ).alias("b"),
    )
    return paired.select(
        F.col("b.blockID").alias("blockID"),
        "recordID",
        "party",
        F.col("b.score").alias("score"),
    )


def purge_blocks(
    elements: DataFrame,
    cfg: PPRLConfig,
    require_both_parties: bool = True,
) -> DataFrame:
    """Keep only useful blocks: present in both parties (the reference's
    inner-join semantics, ReferenceSetBlocking.java:120-122) and, when
    ``cfg.purge_max_block_size`` is set, not oversized (skew guard).

    The count aggregate runs over the slim (blockID, party) projection —
    map-side partial aggregation makes this shuffle tiny — and the verdict
    is applied with a semi-join, so hot blocks never materialize downstream.
    """
    counts = elements.groupBy("blockID").agg(
        F.sum(F.when(F.col("party") == "A", 1).otherwise(0)).alias("nA"),
        F.sum(F.when(F.col("party") == "B", 1).otherwise(0)).alias("nB"),
    )
    cond = F.lit(True)
    if require_both_parties:
        cond = cond & (F.col("nA") > 0) & (F.col("nB") > 0)
    if cfg.purge_max_block_size is not None:
        cond = cond & ((F.col("nA") + F.col("nB")) <= cfg.purge_max_block_size)
    keep = counts.where(cond).select("blockID")
    return elements.join(keep, "blockID", "left_semi")


def assemble_blocks(elements: DataFrame) -> DataFrame:
    """(blockID, recordID, party, score) -> per-block sorted element arrays.

    Mirrors the reference Block table (rank = Σ scores, Block.java:36-42 —
    computed there but unused downstream; we keep it as a purge weight).
    """
    return elements.groupBy("blockID").agg(
        F.array_sort(
            F.collect_list(F.struct("score", "party", "recordID"))
        ).alias("elements"),
        F.sum("score").alias("rank"),
        F.count(F.lit(1)).alias("size"),
    )
