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


def test_tfidf_topk_scores_and_total_order(spark):
    """tf-idf math against a hand-computed corpus, deterministic
    tiebreak (score desc, token asc), and partition invariance."""
    import math

    from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators.ranking import (
        tfidf_topk,
    )

    rows = [
        (1, ["apple", "apple", "banana"]),
        (2, ["banana", "cherry"]),
        (3, ["cherry", "cherry", "cherry", "durian"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    out = {(r["doc_id"], r["rank"]): r for r in tfidf_topk(df, k=2).collect()}

    def s(tf, dfreq, n=3):
        return round(tf * (math.log((n + 1) / (dfreq + 1)) + 1.0), 6)

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert out[(1, 1)]["token"] == "apple" and out[(1, 1)]["tfidf"] == s(2, 1)
    assert out[(1, 2)]["token"] == "banana" and out[(1, 2)]["tfidf"] == s(1, 2)
    # doc 2: banana and cherry tie at tf=1 df=2 -> token asc breaks it
    assert out[(2, 1)]["token"] == "banana"
    assert out[(2, 2)]["token"] == "cherry"
    # doc 3: cherry tf=3 beats durian's rarer-but-single hit at this N
    assert out[(3, 1)]["token"] == "cherry" and out[(3, 1)]["tfidf"] == s(3, 2)
    assert out[(3, 2)]["token"] == "durian" and out[(3, 2)]["tfidf"] == s(1, 1)
    a = sorted(map(tuple, tfidf_topk(df.repartition(1), k=2).collect()))
    b = sorted(map(tuple, tfidf_topk(df.repartition(5), k=2).collect()))
    assert a == b
