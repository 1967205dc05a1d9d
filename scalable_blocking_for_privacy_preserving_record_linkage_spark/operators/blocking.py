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


def _cyclic_pair_expr(arr_col: str = "arr"):
    """Cyclic adjacent pairing over an s-ordered array<struct<s, classID,
    score>> column — the createBlockIDs transform as one expression."""
    arr = F.col(arr_col)
    n = F.size(arr)
    return F.transform(
        arr,
        lambda e, i: F.struct(
            F.concat_ws(
                "-",
                F.least(
                    e["classID"],
                    F.element_at(arr, ((i + 1) % n) + 1)["classID"],
                ),
                F.greatest(
                    e["classID"],
                    F.element_at(arr, ((i + 1) % n) + 1)["classID"],
                ),
            ).alias("blockID"),
            (e["score"] + F.element_at(arr, ((i + 1) % n) + 1)["score"]).alias(
                "score"
            ),
        ),
    )


def _explode_pairs(grouped: DataFrame) -> DataFrame:
    paired = grouped.select(
        "recordID", "party", F.explode(_cyclic_pair_expr("arr")).alias("b")
    )
    return paired.select(
        F.col("b.blockID").alias("blockID"),
        "recordID",
        "party",
        F.col("b.score").alias("score"),
    )


def block_ids(classified: DataFrame, cfg: PPRLConfig) -> DataFrame:
    """(recordID, party, s, classID, score) -> (blockID, recordID, party, score).

    One shuffle (groupBy recordID); the cyclic pairing itself is narrow.
    """
    grouped = classified.groupBy("recordID", "party").agg(
        F.array_sort(F.collect_list(F.struct("s", "classID", "score"))).alias("arr")
    )
    return _explode_pairs(grouped)


def block_ids_from_arrays(classified_wide: DataFrame, cfg: PPRLConfig) -> DataFrame:
    """Stateless variant over ``classify_wide`` output (recordID, party,
    arr) — a pure projection, so it runs in streaming append mode."""
    return _explode_pairs(classified_wide)


def purge_blocks(
    elements: DataFrame,
    cfg: PPRLConfig,
    require_both_parties: bool = True,
) -> DataFrame:
    """Keep only useful blocks: present in both parties (the reference's
    inner-join semantics, ReferenceSetBlocking.java:120-122) and, when
    ``cfg.purge_max_block_size`` is set, not oversized (skew guard).

    Two physical strategies, chosen by whether a size cap is active:

    * cap set — a SLIM groupBy(blockID) count aggregate (partial map-side
      combine, never co-locates a block's rows) computes keep-verdicts,
      applied with a left_semi join (AQE broadcasts the verdict side when
      small). A degenerate hot block — exactly what the cap guards
      against — is dropped WITHOUT ever funneling its rows into one task,
      which a window aggregate would force.
    * no cap — every block survives size-wise, so hot blocks flow
      downstream regardless; the unbounded window aggregate is then the
      better plan (one shuffle, and its hash(blockID) exchange is reused
      by the candidate stage's windows).
    """
    if cfg.purge_max_block_size is not None:
        stats = elements.groupBy("blockID").agg(
            F.sum(F.when(F.col("party") == "A", 1).otherwise(0)).alias("_nA"),
            F.sum(F.when(F.col("party") == "B", 1).otherwise(0)).alias("_nB"),
        )
        cond = (F.col("_nA") + F.col("_nB")) <= cfg.purge_max_block_size
        if require_both_parties:
            cond = cond & (F.col("_nA") > 0) & (F.col("_nB") > 0)
        keep = stats.where(cond).select("blockID")
        return elements.join(keep, "blockID", "left_semi")

    from pyspark.sql import Window as W

    w = W.partitionBy("blockID").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    counted = elements.withColumn(
        "_nA", F.sum(F.when(F.col("party") == "A", 1).otherwise(0)).over(w)
    ).withColumn(
        "_nB", F.sum(F.when(F.col("party") == "B", 1).otherwise(0)).over(w)
    )
    cond = F.lit(True)
    if require_both_parties:
        cond = cond & (F.col("_nA") > 0) & (F.col("_nB") > 0)
    return counted.where(cond).drop("_nA", "_nB")


def assemble_blocks(elements: DataFrame, salt_buckets: int = 0) -> DataFrame:
    """(blockID, recordID, party, score) -> per-block sorted element arrays.

    Mirrors the reference Block table (rank = Σ scores, Block.java:36-42 —
    computed there but unused downstream; we keep it as a purge weight).

    ``salt_buckets > 0`` enables two-phase SALTED aggregation — the
    explicit skew guard the north star requires for collect_list-style
    groupBys, where a hot blockID (duplicate boilerplate pages) would
    otherwise funnel its whole array into one task: phase 1 groups by
    (blockID, hash(recordID) % salt), phase 2 merges the per-salt partial
    arrays with flatten + array_sort. Counts/sums already partial-agg
    map-side; salting matters for the unbounded array payload.
    """
    struct_col = F.struct("score", "party", "recordID")
    if salt_buckets <= 0:
        return elements.groupBy("blockID").agg(
            F.array_sort(F.collect_list(struct_col)).alias("elements"),
            F.sum("score").alias("rank"),
            F.count(F.lit(1)).alias("size"),
        )
    partial = elements.withColumn(
        "_salt", F.pmod(F.hash("recordID"), F.lit(salt_buckets))
    ).groupBy("blockID", "_salt").agg(
        F.collect_list(struct_col).alias("_part"),
        F.sum("score").alias("_rank"),
        F.count(F.lit(1)).alias("_n"),
    )
    return partial.groupBy("blockID").agg(
        F.array_sort(F.flatten(F.collect_list("_part"))).alias("elements"),
        F.sum("_rank").alias("rank"),
        F.sum("_n").alias("size"),
    )
