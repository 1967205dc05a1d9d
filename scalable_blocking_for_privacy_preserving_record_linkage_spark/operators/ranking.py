"""Scalable global ranking — the distributed replacement for
``Window.orderBy(col)`` with no partitionBy, which serializes the entire
input through ONE task (the classic Spark anti-pattern).

Two-phase plan: ``repartitionByRange`` buckets rows so bucket *i* holds
strictly smaller values than bucket *i+1* (equal keys land in one
bucket), per-bucket ``row_number`` windows run in parallel, and the tiny
per-bucket counts — collected to the driver, cumulative-summed, and
re-inlined as a literal map — turn local ranks into global ones. Cost:
one range shuffle + one count aggregate; no stage ever sees more than a
bucket of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame, order_col: str, rank_col: str = "rn", buckets: int | None = None
) -> DataFrame:
    """Append a 1-based global ``row_number`` by ``order_col`` without a
    single-task window. Ties receive arbitrary distinct ranks (same
    contract as the plain-window form)."""
    spark = df.sparkSession
    buckets = buckets or spark.sparkContext.defaultParallelism
    parts = df.repartitionByRange(buckets, order_col).withColumn(
        "_p", F.spark_partition_id()
    )
    counts = {
        r["_p"]: r["cnt"]
        for r in parts.groupBy("_p").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    if not counts:
        return df.withColumn(rank_col, F.lit(0))
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    mapping = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    w = Window.partitionBy("_p").orderBy(order_col)
    return parts.withColumn(
        rank_col,
        (F.row_number().over(w) + mapping[F.col("_p")]).cast("int"),
    ).drop("_p")
