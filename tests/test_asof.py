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


def _random_fixture(spark, n_left=300, n_right=200, hot_frac=0.0, seed=7):
    import random

    rnd = random.Random(seed)
    keys = [f"u{i}" for i in range(10)]

    def key():
        return keys[0] if rnd.random() < hot_frac else rnd.choice(keys)

    left = spark.createDataFrame(
        [(i, float(rnd.randint(0, 5000)), key()) for i in range(n_left)],
        "event_id long, ts double, user_id string",
    )
    right = spark.createDataFrame(
        [(key(), float(rnd.randint(0, 5000)), f"t{i}") for i in range(n_right)],
        "user_id string, ts double, tag string",
    )
    return left, right


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_bucketed_variant_equals_plain(spark):
    left, right = _random_fixture(spark)
    plain = asof.asof_join(left, right, on="ts", by=("user_id",))
    for width in (100.0, 997.0, 10_000.0):  # incl. one bucket >> range
        bucketed = asof.asof_join(
            left, right, on="ts", by=("user_id",), bucket_width_seconds=width
        )
        assert _collect_sorted(bucketed) == _collect_sorted(plain), width


def test_bucketed_variant_equals_plain_with_tolerance(spark):
    left, right = _random_fixture(spark, seed=11)
    plain = asof.asof_join(
        left, right, on="ts", by=("user_id",), tolerance_seconds=300.0
    )
    bucketed = asof.asof_join(
        left, right, on="ts", by=("user_id",),
        tolerance_seconds=300.0, bucket_width_seconds=250.0,
    )
    assert _collect_sorted(bucketed) == _collect_sorted(plain)


def test_bucketed_hot_key_splits_across_tasks(spark):
    """One key carrying 90% of rows must NOT serialize into a single
    window task: the big window partitions by (key, bucket), so the hot
    key's rows spread across its occupied buckets. The per-key serial
    remainder is only the bucket-summary carry window (rows = occupied
    buckets, not events)."""
    left, right = _random_fixture(spark, n_left=2000, n_right=1000, hot_frac=0.9)
    bucketed = asof.asof_join(
        left, right, on="ts", by=("user_id",), bucket_width_seconds=500.0
    )
    plain = asof.asof_join(left, right, on="ts", by=("user_id",))
    assert _collect_sorted(bucketed) == _collect_sorted(plain)
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    # the event-scale window must be keyed by (user_id, _bkt)
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert any("user_id" in s and "_bkt" in s for s in specs), specs
    # hot-key rows actually land in many distinct window partitions
    n_parts = (
        left.where("user_id = 'u0'")
        .select((F.floor(F.col("ts") / 500.0)).alias("b"))
        .distinct()
        .count()
    )
    assert n_parts >= 5


def test_null_times_never_match(spark):
    """ANSI/DuckDB ASOF: null never satisfies the inequality. Null-time
    right rows are dropped; null-time left rows attach nulls — in both
    the plain and bucketed variants."""
    left = spark.createDataFrame(
        [(1, 10.0, "u1"), (2, None, "u1")],
        "event_id long, ts double, user_id string",
    )
    right = spark.createDataFrame(
        [("u1", None, "bad"), ("u1", 5.0, "ok")],
        "user_id string, ts double, tag string",
    )
    for kw in ({}, {"bucket_width_seconds": 100.0}):
        out = {
            r.event_id: r.tag_right
            for r in asof.asof_join(
                left, right, on="ts", by=("user_id",), **kw
            ).collect()
        }
        assert out == {1: "ok", 2: None}, kw


def test_property_matches_pandas_merge_asof(spark):
    """Independent oracle: pandas merge_asof (backward, by-key, with and
    without tolerance) on randomized frames — both the plain and the
    bucketed variant must agree with it. Right (key, ts) pairs are kept
    unique so the ordered-tiebreak conventions coincide."""
    import random

    import pandas as pd

    rnd = random.Random(123)
    keys = ["a", "b", "c", "d"]
    seen = set()
    right_rows = []
    for i in range(120):
        k, t = rnd.choice(keys), float(rnd.randint(0, 1000))
        if (k, t) in seen:
            continue
        seen.add((k, t))
        right_rows.append((k, t, f"tag{i}"))
    left_rows = [
        (i, float(rnd.randint(0, 1000)), rnd.choice(keys + ["zzz"]))
        for i in range(200)
    ]
    left = spark.createDataFrame(left_rows, "event_id long, ts double, user_id string")
    right = spark.createDataFrame(right_rows, "user_id string, ts double, tag string")
    lpd = pd.DataFrame(left_rows, columns=["event_id", "ts", "user_id"]).sort_values("ts")
    rpd = pd.DataFrame(right_rows, columns=["user_id", "ts", "tag"]).sort_values("ts")

    for tol in (None, 50.0):
        expect = pd.merge_asof(
            lpd, rpd, on="ts", by="user_id", direction="backward",
            suffixes=("", "_right"),
            **({"tolerance": tol} if tol is not None else {}),
        )
        want = {
            int(r.event_id): (None if pd.isna(r.tag) else r.tag)
            for r in expect.itertuples()
        }
        for kw in ({}, {"bucket_width_seconds": 130.0}):
            got = {
                r.event_id: r.tag_right
                for r in asof.asof_join(
                    left, right, on="ts", by=("user_id",),
                    tolerance_seconds=tol, **kw,
                ).collect()
            }
            assert got == want, (tol, kw)


def test_null_by_keys_never_match(spark):
    """ANSI equality is null-unsafe: a null by-key right row can never be
    attached, and null-key left rows attach nulls — identically in the
    plain and bucketed variants (the bucketed carry join would otherwise
    diverge from the window's null-grouping semantics)."""
    left = spark.createDataFrame(
        [(1, 10.0, None), (2, 10.0, "u1")],
        "event_id long, ts double, user_id string",
    )
    right = spark.createDataFrame(
        [(None, 5.0, "nullkey"), ("u1", 5.0, "ok")],
        "user_id string, ts double, tag string",
    )
    for kw in ({}, {"bucket_width_seconds": 3.0}):
        out = {
            r.event_id: r.tag_right
            for r in asof.asof_join(
                left, right, on="ts", by=("user_id",), **kw
            ).collect()
        }
        assert out == {1: None, 2: "ok"}, kw


def _window_specs(df):
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.findall(r"windowspecdefinition\(([^)]*)\)", plan)


def test_auto_keeps_plain_plan_on_uniform_keys(spark):
    """Default ("auto"): uniform small inputs stay on the plain one-shuffle
    union+window plan — the pre-pass must not pay the two extra shuffles
    of the bucketed variant when no key is degenerate."""
    left, right = _random_fixture(spark)
    res = asof.asof_join(left, right, on="ts", by=("user_id",))
    assert not any("_bkt" in s for s in _window_specs(res))
    assert _collect_sorted(res) == _collect_sorted(
        asof.asof_join(left, right, on="ts", by=("user_id",), bucket_width_seconds=None)
    )


def test_auto_flips_to_bucketed_plan_on_hot_key(spark):
    """Default ("auto") with NO caller opt-in: a key holding ~95% of 120k
    rows (over the 50k serialization floor and 4x the fair share) must
    flip to the two-phase bucketed plan with a derived width, and the
    output must equal the plain plan's exactly."""
    key = F.when(
        F.col("id") % 20 != 0, F.lit("hot")
    ).otherwise(F.concat(F.lit("u"), (F.col("id") % 50).cast("string")))
    left = spark.range(120_000).select(
        F.col("id").alias("event_id"),
        ((F.col("id") * 37) % 9973).cast("double").alias("ts"),
        key.alias("user_id"),
    )
    right = spark.range(5_000).select(
        key.alias("user_id"),
        ((F.col("id") * 91) % 9973).cast("double").alias("ts"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("tag"),
    )
    auto = asof.asof_join(left, right, on="ts", by=("user_id",))
    assert any("user_id" in s and "_bkt" in s for s in _window_specs(auto))
    plain = asof.asof_join(
        left, right, on="ts", by=("user_id",), bucket_width_seconds=None
    )
    assert auto.exceptAll(plain).count() == 0
    assert plain.exceptAll(auto).count() == 0


def test_bucketed_variant_on_timestamp_ntz_columns(spark):
    """The bucketed plan (and the auto pre-pass) must work when `on` is a
    real timestamp column — TIMESTAMP_NTZ has no direct double cast, which
    previously crashed any non-plain path on parquet event tables."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "u1"), (2, "2024-01-01 12:00:00", "u1")],
        "event_id long, ts string, user_id string",
    ).select("event_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "user_id")
    right = spark.createDataFrame(
        [("u1", "2024-01-01 09:30:00", "a"), ("u1", "2024-01-01 11:00:00", "b")],
        "user_id string, ts string, tag string",
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "tag")
    for kw in (
        {},
        {"bucket_width_seconds": 1800.0},
        {"bucket_width_seconds": 1800.0, "tolerance_seconds": 3600.0},
    ):
        out = {
            r.event_id: r.tag_right
            for r in asof.asof_join(
                left, right, on="ts", by=("user_id",), **kw
            ).collect()
        }
        assert out == {1: "a", 2: "b"}, kw
