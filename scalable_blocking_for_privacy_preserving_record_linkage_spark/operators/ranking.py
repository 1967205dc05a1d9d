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


def cap_per_key(
    df: DataFrame,
    key_cols: tuple[str, ...],
    k: int,
    tiebreak_col: str,
    seed: int = 0,
    prefilter_factor: int = 4,
) -> DataFrame:
    """Deterministic per-key row cap — the domain-balancing pass a crawl
    corpus runs so one boilerplate-heavy host cannot dominate training
    data: keep (at most) the ``k`` rows with the smallest
    ``md5_int(seed | tiebreak)`` per key.

    Scale shape, in order of skew exposure:

    * one slim groupBy(key) count + count-attach join (hash exchange on
      key, shared by the window below);
    * keys at-or-under the cap PASS THROUGH — no sort, no window;
    * oversized keys are hash-PREFILTERED before ranking: ``md5_int`` is
      uniform on [0, 2^32), so keeping hashes below
      ``2^32 * prefilter_factor * k / count`` leaves ~``factor*k`` rows
      per key; only those are ranked. A 10^9-row hot domain therefore
      never funnels through a single window task — the rank input is
      O(factor * k) rows per key regardless of key size. (With factor 4
      the chance the prefilter keeps fewer than ``k`` is
      Chernoff-negligible for k >= ~20; the op then returns what
      survived — deterministic, and the SQL twin reproduces it exactly.)

    Output: the input rows (original columns) of the kept subset.
    """
    keys = list(key_cols)
    from ..functions.hashing import md5_int_expr

    h = md5_int_expr(
        F.concat_ws("|", F.lit(str(seed)), F.col(tiebreak_col).cast("string"))
    )
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_cnt"))
    dfc = df.join(counts, keys).withColumn("_h", h)
    passed = dfc.where(F.col("_cnt") <= k)
    bound = F.lit(float(2**32)) * prefilter_factor * k / F.col("_cnt")
    cand = dfc.where((F.col("_cnt") > k) & (F.col("_h") < bound))
    w = Window.partitionBy(*keys).orderBy(F.col("_h").asc(), F.col(tiebreak_col).asc())
    ranked = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    return passed.unionByName(ranked).drop("_cnt", "_h")


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    k: int = 3,
) -> DataFrame:
    """Per-document top-``k`` keywords by smoothed tf-idf
    (``tf * (ln((N+1)/(df+1)) + 1)``), total-ordered by
    (score desc, token asc) so the selection is deterministic.

    Scale shape for 10^12 docs: term frequencies are an in-row
    aggregation (explode -> groupBy(doc, token) with map-side partial
    agg), document frequencies a second partial-agg groupBy on the
    token alone; the df table joins back token-to-token under AQE
    (typical vocabularies broadcast). The top-k window partitions by
    the DOC id — millions of tiny independent windows, never a global
    sort. Scores round to 6 places for a stable SQL twin.
    """
    terms = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens_col).alias("token")
    )
    tf = terms.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = (
        terms.distinct().groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    )
    # N as a broadcast 1-row aggregate keeps the plan fully lazy (no
    # count() at DataFrame-construction time — the as-of guard lesson)
    n_row = F.broadcast(docs.agg(F.count(F.lit(1)).cast("long").alias("_n")))
    scored = tf.join(df_tbl, "token").crossJoin(n_row).select(
        "id",
        "token",
        F.round(
            F.col("tf")
            * (F.log((F.col("_n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            F.col("id").alias(id_col),
            F.col("rn").cast("int").alias("rank"),
            "token",
            "tfidf",
        )
    )
