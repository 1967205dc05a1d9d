"""As-of join semantics: backward-inclusive, per-key, tolerance, nulls."""

from pyspark.sql import functions as F

from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators import (
    asof,
)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "u1"), (2, 20.0, "u1"), (3, 5.0, "u2"), (4, 7.0, "u3")],
        "event_id long, ts double, user_id string",
    )
    right = spark.createDataFrame(
        [("u1", 8.0, "a"), ("u1", 10.0, "b"), ("u1", 15.0, "c"), ("u2", 6.0, "d")],
        "user_id string, ts double, tag string",
    )
    return left, right


def test_backward_inclusive_match(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: (r.ts_right, r.tag_right)
        for r in asof.asof_join(left, right, on="ts", by=("user_id",)).collect()
    }
    assert out[1] == (10.0, "b")  # equal time INCLUDED (l.ts >= r.ts)
    assert out[2] == (15.0, "c")  # latest earlier, not first
    assert out[3] == (None, None)  # u2's only click is later -> no match
    assert out[4] == (None, None)  # u3 has no right rows at all


def test_tolerance_drops_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r.tag_right
        for r in asof.asof_join(
            left, right, on="ts", by=("user_id",), tolerance_seconds=2.0
        ).collect()
    }
    assert out[1] == "b"   # age 0 <= 2
    assert out[2] is None  # age 5 > 2 -> dropped
    assert out[3] is None and out[4] is None


def test_left_rows_and_columns_preserved(spark):
    left, right = _frames(spark)
    res = asof.asof_join(left, right, on="ts", by=("user_id",))
    assert res.count() == left.count()
    assert res.columns == ["event_id", "ts", "user_id", "ts_right", "tag_right"]


def test_single_shuffle_no_join_in_plan(spark):
    left, right = _frames(spark)
    plan = asof.asof_join(left, right, on="ts", by=("user_id",))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # resolved by union + window, never a join
    assert plan.count("Exchange") <= 2  # one hash exchange per input branch
