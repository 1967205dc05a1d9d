"""Deterministic mixture sampling: reproducibility, partition
invariance, rate calibration, and set-growth stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators import sampling


def _docs(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )


def test_partition_invariant_and_reproducible(spark):
    d = _docs(spark)
    rates = {"en": 0.5, "de": 0.2}
    a = sampling.weighted_sample(d, rates, seed=9)
    b = sampling.weighted_sample(d.repartition(17), rates, seed=9)
    ids = lambda df: {r.doc_id for r in df.select("doc_id").collect()}  # noqa: E731
    assert ids(a) == ids(b)
    assert ids(a) == ids(sampling.weighted_sample(d, rates, seed=9))
    # different seed -> different set
    assert ids(a) != ids(sampling.weighted_sample(d, rates, seed=10))


def test_rates_calibrated(spark):
    d = _docs(spark, 9000)
    kept = sampling.weighted_sample(
        d, {"en": 0.5, "de": 0.1, "fr": 1.0}, seed=3, default_rate=0.0
    )
    got = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # 3000 per stratum; the hash draw is uniform -> ~binomial tolerance
    assert abs(got["en"] - 1500) < 150
    assert abs(got["de"] - 300) < 90
    assert got["fr"] == 3000  # rate 1.0 keeps everything


def test_membership_stable_under_corpus_growth(spark):
    """A row's keep-decision depends only on (seed, id): growing the
    corpus never flips earlier rows (the property DataFrame.sample
    lacks)."""
    rates = {"en": 0.4, "de": 0.4, "fr": 0.4}
    small = sampling.weighted_sample(_docs(spark, 1000), rates, seed=5)
    big = sampling.weighted_sample(_docs(spark, 3000), rates, seed=5)
    small_ids = {r.doc_id for r in small.collect()}
    big_ids = {r.doc_id for r in big.collect()}
    assert small_ids == {i for i in big_ids if i < 1000}


def test_default_rate_zero_drops_unlisted(spark):
    d = _docs(spark, 300)
    kept = sampling.weighted_sample(d, {"en": 1.0}, seed=1, default_rate=0.0)
    langs = {r.lang for r in kept.select("lang").distinct().collect()}
    assert langs == {"en"}


def test_weighted_repeat_multiplicities(spark):
    d = _docs(spark, 3000)
    out = sampling.weighted_repeat(
        d, {"en": 2.25, "de": 0.5, "fr": 1.0}, seed=4
    )
    per_doc = {
        (r.doc_id): r.n
        for r in out.groupBy("doc_id", "lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    langs = {r.doc_id: r.lang for r in d.collect()}
    for doc_id, n in per_doc.items():
        lang = langs[doc_id]
        if lang == "en":
            assert n in (2, 3)
        elif lang == "de":
            assert n == 1  # survivors of the 0.5 thinning appear once
        else:
            assert n == 1
    # en: every doc at least twice; ~25% thrice
    en_total = sum(n for i, n in per_doc.items() if langs[i] == "en")
    n_en = sum(1 for i in per_doc if langs[i] == "en")
    assert n_en == 1000  # rate >= 1 keeps every doc
    assert abs(en_total - 2250) < 120
    # de: ~half survive
    n_de = sum(1 for i in per_doc if langs[i] == "de")
    assert abs(n_de - 500) < 90
    # copy_idx is 1..n per doc
    bad = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("copy_idx").alias("mx"), F.min("copy_idx").alias("mn")
    ).where((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count()
    assert bad == 0


def test_weighted_repeat_deterministic_and_partition_invariant(spark):
    d = _docs(spark, 1200)
    rates = {"en": 1.75, "de": 2.0, "fr": 0.25}
    rows = lambda df: sorted(  # noqa: E731
        (r.doc_id, r.copy_idx) for r in df.select("doc_id", "copy_idx").collect()
    )
    a = sampling.weighted_repeat(d, rates, seed=8)
    b = sampling.weighted_repeat(d.repartition(13), rates, seed=8)
    assert rows(a) == rows(b)


def test_pack_into_blocks_stream_invariants(spark):
    """Within every shard the packed stream is gapless (offsets are the
    running sum in hash order), blocks_spanned matches the doc's token
    footprint, and the layout is identical under different input
    partitionings (seeded-hash order, not execution order)."""
    from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators.sampling import (
        pack_into_blocks,
    )

    rows = [(i, (i * 37) % 113 + 1) for i in range(200)] + [(999, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_into_blocks(df, block_tokens=64, num_shards=4, seed=7)
    got = out.collect()
    nt = dict(rows)
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r)
        end = r["start_offset"] + max(nt[r["doc_id"]], 1)
        assert r["first_block"] == r["start_offset"] // 64
        last = max(r["start_offset"], r["start_offset"] + nt[r["doc_id"]] - 1)
        assert r["blocks_spanned"] == last // 64 - r["first_block"] + 1
    for shard, rs in by_shard.items():
        rs = sorted(rs, key=lambda r: r["start_offset"])
        offset = 0
        for r in rs:
            assert r["start_offset"] == offset, (shard, r)
            offset += nt[r["doc_id"]]
    a = sorted(map(tuple, pack_into_blocks(df.repartition(1), 
               block_tokens=64, num_shards=4, seed=7).collect()))
    b = sorted(map(tuple, pack_into_blocks(df.repartition(13),
               block_tokens=64, num_shards=4, seed=7).collect()))
    assert a == b
