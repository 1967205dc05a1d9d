"""Two-parallelism scaling probe for the DEDUP path (canonical_docs).

Companion to scripts/scaling_bench.py (which probes the PPRL linkage
path): one invocation = one measurement of the full end-to-end dedup
pipeline — MinHash signatures -> banded LSH candidates -> exact-Jaccard
verify -> connected components -> canonical survivors — on a
deterministically inflated documents table, at ``--cpus`` cores.

Inflation: replica k of a doc prefixes the text with ``"r{k} "`` and
remaps doc_id -> doc_id*factor + k. Replicas keep ~all shingles, so each
original doc becomes a family of ``factor`` near-dups — exactly the
boilerplate-heavy shape a web crawl has, and the candidate/verify/CC
stages all carry real (not skipped) work that is identical at both
parallelism levels. ``max_bucket_size`` is raised in proportion so the
skew purge does not delete the planted families.

Prints one JSON line: {"cpus", "inflate", "n_docs", "wall_sec",
"docs_per_sec", "n_rows", "n_clusters"}.

Orchestration (interleaved trials + BENCH/BASELINE.md appendix) via
scripts/run_scaling.py conventions; launch with scripts/submit.sh for the
spark-submit --py-files path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators import (  # noqa: E402
    dedup,
)
from scalable_blocking_for_privacy_preserving_record_linkage_spark.session import (  # noqa: E402
    get_spark,
)

BANDING = dict(num_hashes=32, num_bands=8, shingle_q=5)


def inflated_documents(spark, sf_dir: str, factor: int):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    k = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("k")
    return docs.select("doc_id", "text", k).select(
        (F.col("doc_id") * factor + F.col("k")).alias("doc_id"),
        F.concat(F.lit("r"), F.col("k").cast("string"), F.lit(" "), F.col("text")).alias("text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--inflate", type=int, default=16)
    args = ap.parse_args()

    # shuffle partition count scales with DATA and is IDENTICAL at both
    # parallelism levels (how a real cluster sizes shuffles: partitions
    # follow input bytes, executors vary). Sizing it to the core count
    # instead gives the low-parallelism level smaller per-task sorts —
    # the verify join carries ~5KB gram-array rows, and cores x 400MB
    # sort state spills at the HIGH level only, corrupting the scaling
    # signal with an artifact of the fixed 8g single-process heap.
    shuffle_parts = max(32, args.inflate * 4)
    spark = get_spark(
        app_name=f"dedup-scaling-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=shuffle_parts,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # input materialized OUTSIDE the timed window (on a cluster it is a
    # table already on disk; repartition so both levels start from the
    # same on-disk-equivalent layout, not from a 1-partition range)
    docs = inflated_documents(spark, args.sf_dir, args.inflate)
    docs = docs.repartition(max(args.cpus * 2, 8)).cache()
    n_docs = docs.count()

    cap = 200 * args.inflate  # keep the purge a SKEW guard, not a family killer

    # warm-up OUTSIDE the timed window (same policy and rationale as
    # scaling_bench.py: codegen compile + worker spin-up are per-process
    # one-time costs, not what the N-vs-4N rule probes)
    warm = docs.limit(256).cache()
    dedup.canonical_docs(warm, max_bucket_size=cap, **BANDING).count()
    warm.unpersist()

    t0 = time.time()
    out = dedup.canonical_docs(docs, max_bucket_size=cap, **BANDING)
    agg = out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    ).collect()[0]
    wall = time.time() - t0

    print(json.dumps({
        "cpus": args.cpus,
        "inflate": args.inflate,
        "n_docs": n_docs,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "n_rows": int(agg["n_rows"]),
        "n_clusters": int(agg["n_clusters"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
