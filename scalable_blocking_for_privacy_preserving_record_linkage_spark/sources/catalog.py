"""Iceberg catalog integration (production) with Parquet fallback (tests).

The north star stores everything in Iceberg: the pages input partitioned
by ``days(warc_ts)`` + ``bucket(N, url)``, blocking tables bucketed by
``blockID``, bloom tables bucketed by ``recordID`` (bucketing co-locates
the J2/J3 attach-joins, SURVEY.md §2.3), and per-stage checkpoints with
snapshot lineage. This container ships no Iceberg runtime jar, so every
entry point degrades to partitioned Parquet with identical call sites —
swapping in Iceberg is a session-config change, not a code change.

Production session config (documented, exercised when the jar exists)::

    SparkSession.builder
      .config("spark.sql.extensions",
              "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
      .config("spark.sql.catalog.pprl", "org.apache.iceberg.spark.SparkCatalog")
      .config("spark.sql.catalog.pprl.type", "hadoop")
      .config("spark.sql.catalog.pprl.warehouse", "<warehouse-uri>")

Production DDL (shape reference)::

    CREATE TABLE pprl.db.pages (url string, warc_ts timestamp, html binary,
                                text string, lang string)
    USING iceberg PARTITIONED BY (days(warc_ts), bucket(1024, url));
    CREATE TABLE pprl.db.blooms (recordID string, party string, ...)
    USING iceberg PARTITIONED BY (bucket(512, recordID));
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    name: str,
    warehouse: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as table ``name``: Iceberg ``writeTo`` when available,
    else partitioned Parquet under ``warehouse`` (same layout semantics)."""
    spark = df.sparkSession
    if iceberg_available(spark):  # pragma: no cover - no runtime in container
        writer = df.writeTo(name)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    path = os.path.join(warehouse, *name.split("."))
    w = df.write.mode(mode if mode != "append" else "append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table(spark: SparkSession, name: str, warehouse: str) -> DataFrame:
    if iceberg_available(spark):  # pragma: no cover
        return spark.read.table(name)
    return spark.read.parquet(os.path.join(warehouse, *name.split(".")))


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed on ``bucket_cols`` via the session
    catalog (the parquet stand-in for Iceberg's ``bucket(N, col)``
    partition transform).

    Bucketing is the shuffle-elimination story for the J2/J3 bloom
    attach-joins (SURVEY.md §2.3): with candidates and blooms both
    bucketed N-ways on the join key, the equi-join reads co-located
    buckets and the plan carries NO Exchange on either side — at 100 TB
    that deletes the two fattest shuffles of the matching stage. Verified
    by plan gate ``tests/test_plans.py::test_bucketed_join_has_no_exchange``.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)
