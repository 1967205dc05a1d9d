"""Fixed-overhead amortization probe (VERDICT r3 next #3).

bench.py's per-query walls at sf0.1 carry a per-job fixed cost (codegen
compilation, Python-worker spin-up, job submission) that a cluster-scale
run amortizes. This probe measures the SAME three headline paths at two
input sizes — sf0.1 (the bench point) and sf0.1 deterministically
inflated ``--inflate``x — and reports wall growth vs the ideal linear
growth. Sublinear growth (ratio << inflate) is the direct evidence that
the bench-point walls are overhead-dominated, not compute-bound.

Inflation preserves workload SHAPE:
* documents: replica k applies a per-replica substitution cipher
  (``translate`` over both alphabet cases) — a bijective char map, so
  every within-replica near-dup/gram relation is preserved exactly while
  cross-replica grams are disjoint (no artificial mega-clusters), and the
  replica id is spliced into doc_id so ids stay unique.
* pprl records: the suffixed-id inflation scaling_bench.py uses.

One JSON line per run:
  {"path": ..., "inflate": N, "wall_sec": ..., "rows": ...}
Orchestrated manually; results recorded in BENCH/AMORTIZE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from scalable_blocking_for_privacy_preserving_record_linkage_spark.session import (  # noqa: E402
    get_spark,
)

ALPHA = "abcdefghijklmnopqrstuvwxyz"
CANARY = (
    "the canary sequence for decontamination probes stays identical "
    "across replicas so the overlap detector has real work"
)


def inflated_documents(spark, sf_dir: str, inflate: int) -> DataFrame:
    """One replica per k in [0, inflate): doc_id -> doc_id*inflate + k,
    text -> per-replica substitution cipher (gram-structure preserving)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if inflate <= 1:
        return docs
    parts = []
    for k in range(inflate):
        rot = ALPHA[k % 26 :] + ALPHA[: k % 26]
        mapped = docs.select(
            (F.col("doc_id") * inflate + k).alias("doc_id"),
            F.translate(
                F.translate(F.col("text"), ALPHA, rot),
                ALPHA.upper(),
                rot.upper(),
            ).alias("text"),
        )
        parts.append(mapped)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_dedup(spark, docs: DataFrame) -> int:
    from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators import dedup

    out = dedup.canonical_docs(
        docs, num_hashes=32, num_bands=8, shingle_q=5, max_bucket_size=200,
        verify_threshold=0.8,
    )
    force(out)
    return -1


def run_decontaminate(spark, docs: DataFrame) -> int:
    from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators import (
        contamination,
    )

    bench = docs.where(F.col("doc_id") % 97 == 0).select(
        "doc_id", F.concat("text", F.lit(" " + CANARY)).alias("text")
    )
    corpus = docs.where(F.col("doc_id") % 97 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 3, F.concat("text", F.lit(" " + CANARY))
        ).otherwise(F.col("text")).alias("text"),
    )
    force(contamination.ngram_contamination(corpus, bench, n=13, min_hits=1))
    return -1


def run_pprl(spark, sf_dir: str, inflate: int) -> int:
    """The scaling_bench end-to-end chain (pinned-RS config) at this
    inflation, timed as one action."""
    from scaling_bench import SCALING_CFG, inflated_records
    from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators import (
        blocking, classify, matching, window,
    )
    from scalable_blocking_for_privacy_preserving_record_linkage_spark.plans import testdata
    from scalable_blocking_for_privacy_preserving_record_linkage_spark.sources import extract
    from scalable_blocking_for_privacy_preserving_record_linkage_spark.sources.io import (
        ensure_parallelism,
    )

    cfg = SCALING_CFG
    records = inflated_records(spark, sf_dir, inflate)
    normalized = ensure_parallelism(extract.normalize_records(records, cfg)).cache()
    n_max = max(
        r["count"] for r in normalized.groupBy("party").count().collect()
    )
    rs = testdata.reference_sets_from_records(records, cfg)
    samples = classify.build_reference_samples(rs, cfg, n_max)
    classified = classify.classify(spark, normalized, samples, cfg)
    elements = blocking.purge_blocks(blocking.block_ids(classified, cfg), cfg)
    candidates = window.candidate_pairs(elements, cfg)
    row = matching.match_stats(candidates, matching.encode_blooms(normalized, cfg), cfg).collect()[0]
    normalized.unpersist()
    return int(row["n_candidates"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", choices=["dedup", "decontaminate", "pprl"], required=True)
    ap.add_argument("--inflate", type=int, default=1)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    shuffle_parts = max(32, args.inflate * 4)
    spark = get_spark(
        app_name=f"amortize-{args.path}-{args.inflate}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=shuffle_parts,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up outside the timed window (same policy as bench.py /
    # scaling_bench.py): one tiny pass of the identical path so codegen +
    # Python workers are warm
    if args.path == "pprl":
        run_pprl(spark, os.path.dirname(args.sf_dir) + "/sf0.001", 1)
        t0 = time.time()
        rows = run_pprl(spark, args.sf_dir, args.inflate)
        wall = time.time() - t0
    else:
        docs = inflated_documents(spark, args.sf_dir, args.inflate)
        small = inflated_documents(spark, os.path.dirname(args.sf_dir) + "/sf0.001", 1)
        runner = run_dedup if args.path == "dedup" else run_decontaminate
        runner(spark, small)
        t0 = time.time()
        rows = runner(spark, docs)
        wall = time.time() - t0

    print(json.dumps({
        "path": args.path,
        "inflate": args.inflate,
        "cpus": args.cpus,
        "shuffle_partitions": shuffle_parts,
        "wall_sec": round(wall, 3),
        "rows": rows,
        "load_1min": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
