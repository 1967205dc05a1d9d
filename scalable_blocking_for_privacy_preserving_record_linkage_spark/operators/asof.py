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
every (left, right-earlier) pair before aggregating the max. Per-key
ordering is inherent to as-of semantics, so a pathologically hot key
serializes into one task — the same caveat every engine's as-of has;
pre-filter or bucket hot keys upstream if the key histogram is
degenerate.

Determinism: ties at identical (by, time) on the right side resolve by
the largest payload struct (documented total order), not arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join; unmatched left rows keep nulls.

    ``right_cols`` limits the attached payload (default: all non-key
    right columns). ``tolerance_seconds`` drops matches older than the
    window (null attach instead), like pandas ``merge_asof`` tolerance.
    Output: every left column, then ``{on}{suffix}`` plus each right
    payload column as ``{col}{suffix}``.
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
    r_t = right.select(
        *bys,
        F.col(on).alias("_t"),
        F.lit(1).alias("_src"),
        F.lit(None).cast(lp_type).alias("_lp"),
        r_payload.alias("_rp"),
    )
    # right rows sort BEFORE left rows at equal time (_src desc), so the
    # running last() is backward-INCLUSIVE (l.t >= r.t), matching
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
    if tolerance_seconds is not None:
        within = (
            F.col("_t").cast("double") - F.col("_m._r_on").cast("double")
        ) <= F.lit(float(tolerance_seconds))
        matched = matched.withColumn(
            "_m", F.when(within, F.col("_m")).otherwise(F.lit(None).cast(rp_type))
        )
    return matched.select(
        *[F.col(f"_lp.{c}").alias(c) for c in left.columns],
        F.col(f"_m._r_on").alias(f"{on}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in rcols],
    )
