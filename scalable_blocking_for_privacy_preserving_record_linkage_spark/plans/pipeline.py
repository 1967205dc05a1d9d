"""End-to-end PPRL pipeline (the reference's ``Simulator.main``,
/root/reference/src/main/java/com/simulator/Simulator.java:21-58, rebuilt
Spark-first).

Stage graph (shuffles annotated; compare the reference's six, SURVEY.md §3):

  records ──(normalize: narrow)──► classify_wide (pandas UDF, all 12
          cells in one projection: narrow) ──► block_ids explode (narrow)
          ──(window purge + ranks on blockID: SHUFFLE 1, shared exchange)
          ──(banded range-join: SHUFFLE 2)──► candidate pairs
          ──(distinct: SHUFFLE 3)
          ──(join blooms ×2: SHUFFLES 4,5)──► matches (codegen Dice filter)
          ──(iterative CC joins)──► clusters

The reference's 12-way classify-union + groupBy(recordID) regroup
collapses into the stateless wide classify (no shuffle at all before
block formation), its two per-party block groupBys + inner join collapse
into one shared-exchange window purge, and its per-row sorted-
neighborhood loop becomes a codegen banded range-join — five shuffles on
slimmer rows versus the reference's six on wider ones, with no Python in
the per-pair path.

Every stage can checkpoint to Parquet (Iceberg in production) with a
lineage manifest; a rerun with the same config resumes after the last
completed stage (north-star resumability requirement).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..config import PPRLConfig
from ..operators import blocking, classify, clustering, matching, window
from ..operators.evaluate import LinkageMetrics, evaluate
from ..sources import extract
from ..sources.io import checkpoint_stage, ensure_parallelism


@dataclass
class PipelineResult:
    records: DataFrame
    classified: DataFrame
    elements: DataFrame
    candidates: DataFrame
    blooms: DataFrame
    matches: DataFrame
    components: DataFrame | None
    metrics: LinkageMetrics | None
    timings: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    records: DataFrame,
    reference_sets: DataFrame,
    cfg: PPRLConfig,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    with_clusters: bool = True,
    with_metrics: bool = True,
    truncate_lineage: bool = False,
) -> PipelineResult:
    """records: (id, surname, name, city, party); reference_sets: (col1..colN)."""
    ph = cfg.params_hash()
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = checkpoint_stage(fn, spark, checkpoint_dir, name, ph, resume)
        timings[name] = time.time() - t0
        return out

    normalized = ensure_parallelism(extract.normalize_records(records, cfg)).cache()

    # the party-count job exists only to size the RS draw and the metrics
    # denominators — skip it entirely when the RS size is pinned and no
    # metrics were requested (one less job on the e2e path)
    n_alice = n_bob = db_size = 0
    if cfg.rs_size_override is None or with_metrics:
        party_counts = {
            r["party"]: r["count"]
            for r in normalized.groupBy("party").count().collect()
        }
        n_alice = party_counts.get("A", 0)
        n_bob = party_counts.get("B", 0)
        db_size = max(n_alice, n_bob)

    samples = classify.build_reference_samples(reference_sets, cfg, db_size)

    # stateless wide classify: all 12 (attr, sample) cells in one projection
    # per record — no explode-then-regroup shuffle (the grid variant,
    # classify.classify, remains for incremental/inspection paths)
    classified = timed(
        "classified", lambda: classify.classify_wide(spark, normalized, samples, cfg)
    )
    elements = timed(
        "block_elements",
        lambda: blocking.purge_blocks(
            blocking.block_ids_from_arrays(classified, cfg), cfg
        ),
    )
    candidates = timed("candidates", lambda: window.candidate_pairs(elements, cfg))
    # the reference caches matches before its double count (Simulator.java:50);
    # without a durable checkpoint we truncate lineage locally so downstream
    # consumers (Dice join, clustering, metrics) never re-run the classify/
    # window DAG — matches MUST be built from the checkpointed candidates
    truncate = checkpoint_dir is None and (
        with_clusters or with_metrics or truncate_lineage
    )
    if truncate:
        candidates = candidates.localCheckpoint()
    blooms = timed("blooms", lambda: matching.encode_blooms(normalized, cfg))
    matches = timed(
        "matches", lambda: matching.match_candidates(candidates, blooms, cfg)
    )
    if truncate:
        matches = matches.localCheckpoint()

    components = None
    if with_clusters:
        t0 = time.time()
        components = clustering.connected_components(matches)
        timings["components"] = time.time() - t0

    metrics = None
    if with_metrics:
        t0 = time.time()
        # expected matches = |ids on both sides| (ground truth: id equality,
        # Simulator.java:62; the reference derives it as DB_SIZE*COMMON_RECORDS
        # from its file construction, Conf.java:54-55)
        a_ids = normalized.where("party = 'A'").select("id")
        b_ids = normalized.where("party = 'B'").select("id")
        expected = a_ids.intersect(b_ids).count()
        metrics = evaluate(matches, candidates, n_alice, n_bob, expected)
        timings["metrics"] = time.time() - t0

    return PipelineResult(
        records=normalized,
        classified=classified,
        elements=elements,
        candidates=candidates,
        blooms=blooms,
        matches=matches,
        components=components,
        metrics=metrics,
        timings=timings,
    )


def run_pipeline_from_pages(
    spark: SparkSession,
    pages: DataFrame,
    reference_sets: DataFrame,
    cfg: PPRLConfig,
    **kw,
) -> PipelineResult:
    """North-star entry: pages (url, warc_ts, html, text, lang) in."""
    records = extract.records_from_pages(pages, cfg)
    return run_pipeline(spark, records, reference_sets, cfg, **kw)
