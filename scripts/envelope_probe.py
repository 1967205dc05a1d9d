"""Reference-envelope scale probe (VERDICT r3 next #8).

The reference's largest published configuration is 800k records per
party (SURVEY.md §6 — its experiments run to that scale on a Spark 2.4
cluster). This probe runs THIS engine's full pipeline at the same record
count per party — sf0.1's documents-derived records deterministically
inflated to >= 800k/party — and records wall, F1, pairs-completeness and
reduction ratio: the direct "matches the reference's envelope" row for
BENCH/BASELINE.md.

Config fidelity: the reference sizes its reference set at 0.1% of the
database (Conf.java:28), so rs_size_override = DB/1000 here (≈800),
unlike the scaling campaigns' pinned rs=120 (those want level-invariant
block geometry; this wants the reference's operating point).

Single measurement (wall disclosed as a single-box number — at this
scale the Dice shuffle stresses the one shared disk; the probe is an
envelope-correctness row, not a throughput headline). Prints one JSON
line; recorded in BENCH/BASELINE.md.

Usage: python scripts/envelope_probe.py [--records-per-party 800000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scaling_bench import inflated_records  # noqa: E402
from scalable_blocking_for_privacy_preserving_record_linkage_spark.config import (  # noqa: E402
    PPRLConfig,
)
from scalable_blocking_for_privacy_preserving_record_linkage_spark.plans import (  # noqa: E402
    testdata,
)
from scalable_blocking_for_privacy_preserving_record_linkage_spark.plans.pipeline import (  # noqa: E402
    run_pipeline,
)
from scalable_blocking_for_privacy_preserving_record_linkage_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records-per-party", type=int, default=800_000)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    probe = get_spark(app_name="envelope-base-count", master="local[4]")
    probe.sparkContext.setLogLevel("ERROR")
    base = testdata.records_from_documents(testdata.documents(probe, args.sf_dir))
    base_per_party = max(
        r["count"] for r in base.groupBy("party").count().collect()
    )
    probe.stop()
    inflate = -(-args.records_per_party // base_per_party)

    db = base_per_party * inflate
    cfg = PPRLConfig(
        rs_size_override=max(1, db // 1000),  # the reference's 0.1% rule
        purge_max_block_size=20000,
    )
    shuffle_parts = max(64, inflate)
    spark = get_spark(
        app_name=f"envelope-{db}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=shuffle_parts,
    )
    spark.sparkContext.setLogLevel("ERROR")

    records = inflated_records(spark, args.sf_dir, inflate)
    rs = testdata.reference_sets_from_records(records, cfg)

    # warm-up outside the timed window (same policy as every campaign)
    small = testdata.records_from_documents(
        testdata.documents(spark, os.path.dirname(args.sf_dir) + "/sf0.001")
    )
    run_pipeline(spark, small, rs, cfg, with_clusters=False, with_metrics=True)

    t0 = time.time()
    res = run_pipeline(
        spark, records, rs, cfg, with_clusters=False, with_metrics=True
    )
    m = res.metrics.as_dict()
    wall = time.time() - t0

    print(json.dumps({
        "records_per_party": m["n_alice"],
        "inflate": inflate,
        "cpus": args.cpus,
        "shuffle_partitions": shuffle_parts,
        "wall_sec": round(wall, 3),
        "pairs_scored": m["n_candidates"],
        "pairs_per_sec": round(m["n_candidates"] / wall, 1),
        "f1": round(m["f1"], 6),
        "pairs_completeness": round(m["pairs_completeness"], 6),
        "precision": round(m["precision"], 6),
        "reduction_ratio": round(m["reduction_ratio"], 6),
        "rs_size": cfg.rs_size_override,
        "load_1min": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
