"""Connected components over match edges."""

from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators.clustering import (
    clusters_table,
    connected_components,
)


def test_components_chain(spark):
    # A1-B1, A2-B1, A2-B2 form one component; A9-B9 another
    matches = spark.createDataFrame(
        [("1", "1"), ("2", "1"), ("2", "2"), ("9", "9")],
        "record1 string, record2 string",
    )
    comps = connected_components(matches)
    rows = {r["node"]: r["component"] for r in comps.collect()}
    assert rows["A:1"] == rows["B:1"] == rows["A:2"] == rows["B:2"] == "A:1"
    assert rows["A:9"] == rows["B:9"] == "A:9"
    ct = {r["component"]: r["size"] for r in clusters_table(comps).collect()}
    assert ct == {"A:1": 4, "A:9": 2}


def test_components_empty(spark):
    matches = spark.createDataFrame([], "record1 string, record2 string")
    assert connected_components(matches).count() == 0
