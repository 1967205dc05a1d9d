"""As-of (point-in-time) join — a primitive Spark lacks natively.

For each left row, attach the most recent right row with
``right.time <= left.time`` within the same ``by`` key (backward
inclusive — the attribution/point-in-time-correctness join every event
pipeline needs: purchase -> latest prior click, quote -> latest trade,
feature snapshot -> latest update).

Scale shape: NO join at all — both sides are tagged, unioned, and
resolved with ONE window over a single hash(by) exchange (last
non-null right payload over rows-between-unbounded-preceding). That is
one shuffle of left+right, versus the naive range-join which explodes
every (left, right-earlier) pair before aggregating the max.

Hot keys: per-key ordering is inherent to as-of semantics, so the plain
window serializes a pathologically hot ``by`` key into one task. The
DEFAULT (``bucket_width_seconds="auto"``) guards against this with a
SKETCH-first pre-pass (``_auto_bucket_width``): a seeded 1-in-32 hash
sample of just the key+time columns of both sides estimates the hottest
key's row count; if the (scaled) estimate clearly exceeds
``max(50_000, 4 * total / shuffle_partitions)`` — i.e. one window task
would carry both a multiple of its fair share and enough rows to
matter — the plan flips to the salted two-phase variant below with a
derived width of ``(t_max - t_min) / (4 * shuffle_partitions)``; if it
is clearly below, the plain one-shuffle plan runs; only a borderline
estimate (within 0.5-2x of the threshold) re-runs the aggregation
exactly on the full projection. Pass ``None`` to force the plain plan
(skips the guard job entirely), or a number to force the bucketed plan
with that width. The guard costs one column-pruned scan of both inputs
with 1/32 of the aggregation work (AQE-style runtime statistics are
the alternative, but Spark exposes no plan-rewrite hook at this layer)
— the price of never serializing a hot key into one multi-hour task at
cluster scale; callers who know their key histogram opt out with
``None``. NOTE: the guard runs Spark jobs at DataFrame-construction
time (see ``asof_join``'s eager-evaluation note); streaming inputs
skip it.

The two-phase variant: the
timeline splits into fixed buckets, phase 1 pre-aggregates the right
side to one "latest in bucket" summary per (key, bucket) and computes
each bucket's carry-in (the latest right row from all EARLIER buckets)
with a window over the tiny summary table (rows = occupied buckets per
key, not events per key), and phase 2 runs the union+window partitioned
by (key, bucket) — a hot key now spreads across as many tasks as it has
occupied buckets, with identical output (equivalence + skew tests in
tests/test_asof.py).

Determinism: ties at identical (by, time) on the right side resolve by
the largest payload struct (documented total order), not arrival order —
in both variants (the bucket summary takes max(struct(time, payload)),
the same total order the window's last() resolves to).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# below this, even a fully serialized per-key window task is subsecond —
# the auto pre-pass never flips to the bucketed plan for less
_AUTO_SKEW_FLOOR = 50_000
# hot key must also exceed this multiple of the fair per-partition share
_AUTO_SKEW_FACTOR = 4
# skew SKETCH: a seeded 1-in-N hash sample of the slim (by, t) projection
# decides the plan; only a borderline estimate (within _SKETCH_BAND of the
# threshold) falls back to the exact pre-pass. At rate 1/32 a key at the
# 50k floor draws ~1.5k sample rows (sigma ~40, <3% relative), so the
# band is generous.
_SKETCH_RATE = 32
_SKETCH_BAND = (0.5, 2.0)


def _epoch_seconds(c: Column, dt: T.DataType) -> Column:
    """Numeric seconds view of the time column for bucketing/tolerance
    arithmetic. TIMESTAMP_NTZ has no direct double cast (ANSI), so
    timestamps hop through TIMESTAMP first; numerics cast directly."""
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def _key_stats(slim: DataFrame, bys: list[str], t_dbl) -> tuple:
    """(hot, total, lo, hi) of a (by, _t) frame in one aggregation job."""
    per_key = slim.groupBy(*bys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(t_dbl).alias("_lo"),
        F.max(t_dbl).alias("_hi"),
    )
    row = per_key.agg(
        F.max("_n").alias("hot"),
        F.sum("_n").alias("total"),
        F.min("_lo").alias("lo"),
        F.max("_hi").alias("hi"),
    ).collect()[0]
    return row["hot"], row["total"], row["lo"], row["hi"]


def _auto_bucket_width(l_t: DataFrame, r_t: DataFrame, bys: list[str]) -> float | None:
    """Skew guard for the auto plan choice, SKETCH-first: a seeded
    1-in-``_SKETCH_RATE`` hash sample of the slim (by, _t) projection of
    both sides estimates the hottest key's row count (scaled by the
    rate); per-row hashing keeps the sample i.i.d. within keys, so
    estimates concentrate tightly at the decision sizes (see
    ``_SKETCH_RATE``). A clear verdict — hot estimate outside
    ``_SKETCH_BAND`` of the flip threshold — decides the plan from the
    sample alone; only a borderline read re-runs the aggregation on the
    full projection (the round-4 exact pre-pass). Returns a derived
    bucket width when the key histogram is degenerate, else None
    (plain plan).

    Both passes still SCAN the slim projection once (no job avoids the
    read); the sketch removes almost all of the aggregation work — the
    hash filter evaluates per row and the partial-agg hash map sees
    1/rate of the rows."""
    spark = l_t.sparkSession
    parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions", "200")))
    t_dbl = _epoch_seconds(F.col("_t"), l_t.schema["_t"].dataType)
    slim = l_t.select(*bys, "_t").unionByName(r_t.select(*bys, "_t"))

    sample = slim.where(
        F.pmod(F.xxhash64(*bys, F.col("_t"), F.lit(982_451_653)), F.lit(_SKETCH_RATE))
        == 0
    )
    s_hot, s_total, s_lo, s_hi = _key_stats(sample, bys, t_dbl)
    if s_hot is None:
        # empty sample => total < ~rate*ln(...) rows of any key — far
        # below the flip floor either way
        return None
    hot_est, total_est = s_hot * _SKETCH_RATE, s_total * _SKETCH_RATE
    threshold = max(_AUTO_SKEW_FLOOR, _AUTO_SKEW_FACTOR * total_est // parts)
    if hot_est <= _SKETCH_BAND[0] * threshold:
        return None
    if hot_est >= _SKETCH_BAND[1] * threshold and s_hi > s_lo:
        # sample min/max slightly understate the true time range; for a
        # bucket width that only has to spread a hot key over ~4*parts
        # buckets, that bias is irrelevant
        return (s_hi - s_lo) / float(_AUTO_SKEW_FACTOR * parts)

    # borderline (or degenerate sampled time range): exact pre-pass
    hot, total, lo, hi = _key_stats(slim, bys, t_dbl)
    if hot is None:
        return None
    threshold = max(_AUTO_SKEW_FLOOR, _AUTO_SKEW_FACTOR * total // parts)
    if hot <= threshold or lo is None or hi <= lo:
        return None  # uniform enough / no time spread to split on
    return (hi - lo) / float(_AUTO_SKEW_FACTOR * parts)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_seconds: float | None = None,
    bucket_width_seconds: float | None | str = "auto",
) -> DataFrame:
    """Backward-inclusive as-of join; unmatched left rows keep nulls.

    ``right_cols`` limits the attached payload (default: all non-key
    right columns). ``tolerance_seconds`` drops matches older than the
    window (null attach instead), like pandas ``merge_asof`` tolerance.
    ``bucket_width_seconds``: ``"auto"`` (default) runs the sketch-first
    skew guard and picks the plan (module docstring); ``None`` forces the
    plain one-shuffle plan; a number forces the hot-key-safe two-phase
    plan with that width — pick one that gives a hot key tens-to-
    hundreds of occupied buckets. Output: every left column, then
    ``{on}{suffix}`` plus each right payload column as ``{col}{suffix}``.

    **The default triggers eager evaluation**: ``"auto"`` runs one (or,
    on a borderline sketch read, two) Spark jobs over the (by, time)
    projection of both inputs AT DATAFRAME-CONSTRUCTION TIME, and the
    plan choice is frozen then. On expensive un-cached lineages that
    projection recomputes both upstream pipelines — cache the inputs
    first, or pass ``None``/a number to keep construction fully lazy.
    Streaming inputs skip the guard entirely (no pre-pass job is
    possible mid-plan): the plain plan is used unless a width is given.
    """
    bys = list(by)
    rcols = right_cols or [c for c in right.columns if c not in bys + [on]]
    r_payload = F.struct(
        F.col(on).alias("_r_on"), *[F.col(c).alias(c) for c in rcols]
    )
    rp_type = right.select(r_payload.alias("_rp")).schema["_rp"].dataType
    l_payload = F.struct(*[F.col(c).alias(c) for c in left.columns])
    lp_type = left.select(l_payload.alias("_lp")).schema["_lp"].dataType

    l_t = left.select(
        *bys,
        F.col(on).alias("_t"),
        F.lit(0).alias("_src"),
        l_payload.alias("_lp"),
        F.lit(None).cast(rp_type).alias("_rp"),
    )
    # ANSI/DuckDB ASOF semantics: null never matches — neither a null
    # time (can't satisfy r.t <= l.t) nor a null by-key (equality is
    # null-unsafe). Right rows with any null key/time are dropped; left
    # rows with nulls come through with a null attach. Enforcing this on
    # the right side ALSO keeps the plain and bucketed variants identical:
    # a window partitionBy would group null keys together (SQL grouping
    # semantics), while the bucketed carry join's equality would not.
    r_not_null = F.col(on).isNotNull()
    for b in bys:
        r_not_null = r_not_null & F.col(b).isNotNull()
    r_t = right.where(r_not_null).select(
        *bys,
        F.col(on).alias("_t"),
        F.lit(1).alias("_src"),
        F.lit(None).cast(lp_type).alias("_lp"),
        r_payload.alias("_rp"),
    )

    if bucket_width_seconds == "auto":
        if left.isStreaming or right.isStreaming:
            bucket_width_seconds = None  # no pre-pass job on a stream
        else:
            bucket_width_seconds = _auto_bucket_width(l_t, r_t, bys)

    if bucket_width_seconds is None:
        # right rows sort BEFORE left rows at equal time (_src desc), so
        # the running last() is backward-INCLUSIVE (l.t >= r.t), matching
        # ANSI/DuckDB ASOF JOIN; _rp is the deterministic same-time tiebreak
        w = (
            Window.partitionBy(*bys)
            .orderBy(F.col("_t").asc(), F.col("_src").desc(), F.col("_rp").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = (
            l_t.unionByName(r_t)
            .withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
            .where(F.col("_src") == 0)
        )
    else:
        bkt = F.floor(
            _epoch_seconds(F.col("_t"), l_t.schema["_t"].dataType)
            / float(bucket_width_seconds)
        ).cast("long")
        l_b = l_t.withColumn("_bkt", bkt)
        r_b = r_t.withColumn("_bkt", bkt)
        # phase 1: one summary row per occupied (key, bucket) on the right;
        # max of (time, payload) struct == the window tiebreak's total order
        summ = r_b.groupBy(*bys, "_bkt").agg(
            F.max(F.struct(F.col("_t"), F.col("_rp"))).alias("_last")
        )
        occupied = (
            l_b.select(*bys, "_bkt").union(r_b.select(*bys, "_bkt")).distinct()
        )
        w_carry = (
            Window.partitionBy(*bys)
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_rows = (
            occupied.join(summ, bys + ["_bkt"], "left_outer")
            .withColumn("_carry", F.max("_last").over(w_carry))
            .where(F.col("_carry").isNotNull())
            .select(
                *bys,
                "_bkt",
                F.lit(None).cast(l_t.schema["_t"].dataType).alias("_t"),
                F.lit(1).alias("_src"),
                F.lit(None).cast(lp_type).alias("_lp"),
                F.col("_carry._rp").alias("_rp"),
                F.lit(1).alias("_is_carry"),
            )
        )
        flag = lambda df: df.withColumn("_is_carry", F.lit(0))  # noqa: E731
        # phase 2: the same union+window, but partitioned by (key, BUCKET)
        # — the carry row sorts first in every bucket, so the running
        # last() seeds from the pre-bucket state
        w = (
            Window.partitionBy(*bys, "_bkt")
            .orderBy(
                F.col("_is_carry").desc(),
                F.col("_t").asc(),
                F.col("_src").desc(),
                F.col("_rp").asc(),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = (
            flag(l_b)
            .unionByName(flag(r_b))
            .unionByName(carry_rows)
            .withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
            .where(F.col("_src") == 0)
        )

    if tolerance_seconds is not None:
        t_dt = l_t.schema["_t"].dataType
        within = (
            _epoch_seconds(F.col("_t"), t_dt)
            - _epoch_seconds(F.col("_m._r_on"), t_dt)
        ) <= F.lit(float(tolerance_seconds))
        matched = matched.withColumn(
            "_m", F.when(within, F.col("_m")).otherwise(F.lit(None).cast(rp_type))
        )
    return matched.select(
        *[F.col(f"_lp.{c}").alias(c) for c in left.columns],
        F.col("_m._r_on").alias(f"{on}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in rcols],
    )
