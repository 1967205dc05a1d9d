"""global_rank: two-phase distributed rank == single-window rank."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators.ranking import (
    global_rank,
)


def test_global_rank_matches_window(spark):
    vals = [(f"V{i:04d}",) for i in range(997)]
    df = spark.createDataFrame(vals, "v string").repartition(7)
    got = {r["v"]: r["rn"] for r in global_rank(df, "v", buckets=5).collect()}
    want = {
        r["v"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(Window.orderBy("v"))).collect()
    }
    assert got == want


def test_global_rank_empty(spark):
    df = spark.createDataFrame([], "v string")
    assert global_rank(df, "v").count() == 0


def test_global_rank_plan_has_no_single_partition_exchange(spark):
    """The plan must contain a range repartition, not SinglePartition."""
    df = spark.createDataFrame([(f"V{i}",) for i in range(100)], "v string")
    plan = global_rank(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "singlepartition" not in plan.lower()


def test_cap_per_key_passthrough_and_cap(spark):
    from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators.ranking import (
        cap_per_key,
    )

    rows = [("big", i) for i in range(40)] + [("small", i) for i in range(3)]
    df = spark.createDataFrame(rows, "host string, doc_id long")
    out = cap_per_key(df, ("host",), 5, "doc_id")
    got = out.groupBy("host").count().collect()
    sizes = {r.host: r["count"] for r in got}
    assert sizes == {"big": 5, "small": 3}  # capped vs untouched
    assert out.columns == ["host", "doc_id"]
    # deterministic: same selection on every run and any partitioning
    a = sorted((r.host, r.doc_id) for r in out.collect())
    b = sorted(
        (r.host, r.doc_id)
        for r in cap_per_key(df.repartition(7), ("host",), 5, "doc_id").collect()
    )
    assert a == b
