"""Golden end-to-end pipeline tests + invariants (SURVEY.md §5.2)."""

import pytest
from pyspark.sql import functions as F

from scalable_blocking_for_privacy_preserving_record_linkage_spark.config import PPRLConfig
from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators import clustering
from scalable_blocking_for_privacy_preserving_record_linkage_spark.plans.pipeline import (
    run_pipeline,
    run_pipeline_from_pages,
)
from scalable_blocking_for_privacy_preserving_record_linkage_spark.sources import (
    extract,
    fixtures,
)


@pytest.fixture(scope="module")
def golden(spark):
    """1k/party, 100% overlap (mirrors the reference's 1k configuration,
    Conf.java:54), 5% seeded typos on the B side."""
    cfg = PPRLConfig(rs_size_override=20)
    recs = fixtures.spark_records(spark, 1000, overlap=1.0, typo_rate=0.05, seed=42)
    rs = fixtures.spark_reference_sets(spark, seed=42)
    return run_pipeline(spark, recs, rs, cfg)


def test_golden_f1(golden):
    m = golden.metrics
    assert m.pairs_completeness >= 0.99
    assert m.f1 >= 0.99
    assert 0.0 < m.reduction_ratio < 1.0


def test_golden_match_columns(golden):
    # record1 = Alice id, record2 = Bob id (MetaBlocking.java:64-68)
    a_ids = {r["id"] for r in golden.records.where("party='A'").select("id").collect()}
    b_ids = {r["id"] for r in golden.records.where("party='B'").select("id").collect()}
    sample = golden.matches.limit(50).collect()
    assert all(r["record1"] in a_ids and r["record2"] in b_ids for r in sample)


def test_golden_clusters(golden):
    comps = clustering.clusters_table(golden.components)
    # matched nodes are namespaced A:/B: and every cluster has >= 2 members
    first = comps.orderBy(F.desc("size")).first()
    assert first["size"] >= 2
    assert all(m[:2] in ("A:", "B:") for m in first["members"])


def test_partition_invariance(spark):
    """Output must not depend on input partitioning (NOT true of the
    reference — its collect_list pairing is shuffle-dependent; our sort fix
    makes this assertable, SURVEY.md §2.8.1)."""
    cfg = PPRLConfig(rs_size_override=10, seed=3)
    rs = fixtures.spark_reference_sets(spark, seed=3)

    def matches_with(nparts):
        recs = fixtures.spark_records(spark, 200, overlap=1.0, seed=3).repartition(nparts)
        res = run_pipeline(spark, recs, rs, cfg, with_clusters=False, with_metrics=False)
        return sorted(
            (r["record1"], r["record2"])
            for r in res.matches.select("record1", "record2").collect()
        )

    assert matches_with(1) == matches_with(13)


def test_pages_extractor_invariant(spark):
    pages = fixtures.spark_pages(spark, 300, overlap=0.25, typo_rate=0.0, seed=9)
    bad = pages.where(extract.extract_text(F.col("html")) != F.col("text")).count()
    assert bad == 0


def test_pages_end_to_end(spark):
    cfg = PPRLConfig(rs_size_override=15, seed=9)
    pages = fixtures.spark_pages(spark, 300, overlap=0.25, typo_rate=0.0, seed=9)
    rs = fixtures.spark_reference_sets(spark, seed=9)
    res = run_pipeline_from_pages(spark, pages, rs, cfg, with_clusters=False)
    assert res.metrics.pairs_completeness == 1.0


def test_sample_fraction_at_load(spark):
    """cfg.sample_fraction applies a seeded load-time sample in
    records_from_pages (SQLData.java:21-27 made live): deterministic for a
    fixed seed, strict subset of the unsampled extraction."""
    pages = fixtures.spark_pages(spark, 300, overlap=0.25, typo_rate=0.0, seed=9)
    full = extract.records_from_pages(pages, PPRLConfig(seed=9))
    samp_cfg = PPRLConfig(seed=9, sample_fraction=0.3)
    ids = lambda df: {(r["id"], r["party"]) for r in df.select("id", "party").collect()}
    s1, s2 = (
        ids(extract.records_from_pages(pages, samp_cfg)) for _ in range(2)
    )
    assert s1 == s2                      # seeded -> reproducible
    assert s1 < ids(full)                # strict subset
    assert 0 < len(s1) < 300 * 2 * 0.6   # roughly the asked fraction


def test_checkpoint_resume(spark, tmp_path):
    cfg = PPRLConfig(rs_size_override=10, seed=5)
    recs = fixtures.spark_records(spark, 150, overlap=0.5, seed=5)
    rs = fixtures.spark_reference_sets(spark, seed=5)
    d = str(tmp_path / "ckpt")
    r1 = run_pipeline(spark, recs, rs, cfg, checkpoint_dir=d, with_clusters=False)
    n1 = r1.matches.count()
    # second run resumes from checkpoints (same params hash) and agrees
    r2 = run_pipeline(spark, recs, rs, cfg, checkpoint_dir=d, with_clusters=False)
    assert r2.matches.count() == n1
    # changed params invalidate the checkpoint (different hash)
    cfg2 = PPRLConfig(rs_size_override=10, seed=5, window_size=3)
    r3 = run_pipeline(spark, recs, rs, cfg2, checkpoint_dir=str(tmp_path / "ckpt2"), with_clusters=False)
    assert r3.matches is not None


def test_null_attrs_dropped(spark):
    cfg = PPRLConfig(rs_size_override=10, seed=7)
    recs = fixtures.spark_records(spark, 200, overlap=0.5, seed=7, null_rate=0.1)
    rs = fixtures.spark_reference_sets(spark, seed=7)
    res = run_pipeline(spark, recs, rs, cfg, with_clusters=False)
    # normalized records contain no null/empty blocking attrs
    for attr in cfg.blocking_attrs:
        assert res.records.where(F.col(attr).isNull() | (F.length(attr) == 0)).count() == 0


def test_catalog_fallback_roundtrip(spark, tmp_path):
    """catalog.write_table/read_table degrade to partitioned parquet when
    no Iceberg runtime is present (this container), same call sites."""
    from scalable_blocking_for_privacy_preserving_record_linkage_spark.sources import catalog

    assert catalog.iceberg_available(spark) is False
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "a", "z")], "id long, part string, v string"
    )
    wh = str(tmp_path / "wh")
    catalog.write_table(df, "db.t1", wh, partition_by=["part"])
    back = catalog.read_table(spark, "db.t1", wh)
    assert sorted(tuple(r) for r in back.select("id", "part", "v").collect()) == [
        (1, "a", "x"), (2, "b", "y"), (3, "a", "z"),
    ]
    # partition layout materialized (partition pruning works on read)
    import os
    assert os.path.isdir(os.path.join(wh, "db", "t1", "part=a"))


def test_north_star_f1_gate(spark):
    """The BASELINE.json bar: pairwise F1 >= 0.99 on labeled pairs, at the
    verify-surface fixture (500/party, 25% overlap, 5% typos) from the
    north-star pages shape. Operating threshold 0.6: the Dice semantics
    are the reference's at ANY t (oracle-checked); t is the tunable the
    operator sets for the precision/recall point, and 0.6 holds
    pairs-completeness at 1.0 while cutting the near-collision false
    positives that t=0.5 admits on syllable-vocabulary data."""
    from scalable_blocking_for_privacy_preserving_record_linkage_spark.plans.pipeline import (
        run_pipeline_from_pages,
    )

    pages = fixtures.spark_pages(spark, 500, overlap=0.25, typo_rate=0.05, seed=42)
    res = run_pipeline_from_pages(
        spark,
        pages,
        fixtures.spark_reference_sets(spark),
        PPRLConfig(rs_size_override=20, matching_threshold=0.6),
    )
    m = res.metrics
    assert m.pairs_completeness >= 0.99
    assert m.f1 >= 0.99


def test_match_stats_agrees_with_two_pass_counts(golden):
    """match_stats (the scaling bench's one-action aggregate) must equal
    candidates.count() / match_candidates().count() exactly."""
    from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators import matching

    cfg = PPRLConfig(rs_size_override=20)
    row = matching.match_stats(
        golden.candidates, golden.blooms, cfg
    ).collect()[0]
    assert row["n_candidates"] == golden.candidates.count()
    assert row["n_matches"] == golden.matches.count()


def test_distributed_fixture_matches_driver_side_semantics(spark):
    """spark_party_records_distributed: same contract as
    generate_party_records — exact per-party counts, exactly n*overlap
    shared ids (ground truth), typo rate in the right ballpark on shared
    B rows only, deterministic and partition-invariant."""
    from pyspark.sql import functions as F

    from scalable_blocking_for_privacy_preserving_record_linkage_spark.sources import (
        fixtures,
    )

    n, overlap, typo = 4000, 0.25, 0.05
    recs, ref = fixtures.spark_party_records_distributed(
        spark, n, overlap=overlap, typo_rate=typo, seed=11
    )
    counts = {r["party"]: r["count"] for r in recs.groupBy("party").count().collect()}
    assert counts == {"A": n, "B": n}
    shared = (
        recs.groupBy("id").agg(F.count_distinct("party").alias("p")).where("p=2").count()
    )
    assert shared == int(n * overlap)
    # typos: only shared B rows may differ from their A twin, at ~typo_rate
    a = recs.where("party='A'").select("id", "surname", "name", "city")
    b = recs.where("party='B'").select(
        "id",
        F.col("surname").alias("s2"),
        F.col("name").alias("n2"),
        F.col("city").alias("c2"),
    )
    j = a.join(b, "id")
    diff = j.where(
        (F.col("surname") != F.col("s2"))
        | (F.col("name") != F.col("n2"))
        | (F.col("city") != F.col("c2"))
    ).count()
    assert 0 < diff < int(n * overlap) * typo * 2.5
    # deterministic + partition-invariant
    again, _ = fixtures.spark_party_records_distributed(
        spark, n, overlap=overlap, typo_rate=typo, seed=11
    )
    assert sorted(map(tuple, recs.collect())) == sorted(
        map(tuple, again.repartition(13).collect())
    )
    # reference table carries the full vocabularies
    assert ref.columns == ["col1", "col2", "col3"]
    assert ref.where(F.col("col1").isNotNull()).count() == 100_000
