"""Reference-envelope scale probe (VERDICT r3 next #8).

The reference's largest published configuration is 800k records per
party (SURVEY.md §6, `Conf.java:8-9,26` — voter-roll-style CSVs). This
probe runs THIS engine's full pipeline at that record count and records
wall, F1, pairs-completeness and reduction ratio — the direct "matches
the reference's envelope" row for BENCH/BASELINE.md.

Fixture fidelity matters at this scale: the reference's voter-roll names
are nearly unique, so the probe uses the DISTRIBUTED high-cardinality
generator (`fixtures.spark_party_records_distributed`, 100k/50k/15k-word
vocabularies, seeded one-char typos on 5% of shared B records). The
first attempt used the sf0.1 documents inflated 214x and measured
F1 0.03 — NOT an engine defect but vocabulary degeneracy (hundreds of
records per surname put true pairs further than W positions apart inside
one score-tie group); that run is disclosed in BENCH/BASELINE.md because
the failure mode is real for low-cardinality attributes at scale.

Config fidelity: the reference sizes its reference set at 0.1% of the
database (Conf.java:28) -> rs_size_override = n/1000; other knobs stay
at the library defaults used by the F1 golden gate (t=0.6, W from cfg).

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

from scalable_blocking_for_privacy_preserving_record_linkage_spark.config import (  # noqa: E402
    PPRLConfig,
)
from scalable_blocking_for_privacy_preserving_record_linkage_spark.plans.pipeline import (  # noqa: E402
    run_pipeline,
)
from scalable_blocking_for_privacy_preserving_record_linkage_spark.session import (  # noqa: E402
    get_spark,
)
from scalable_blocking_for_privacy_preserving_record_linkage_spark.sources import (  # noqa: E402
    fixtures,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records-per-party", type=int, default=800_000)
    ap.add_argument("--overlap", type=float, default=0.25)
    ap.add_argument("--typo-rate", type=float, default=0.05)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--rs-size", type=int, default=None,
        help="reference-set size; default = the reference's 0.1%% rule "
             "(n/1000). Denser sets shrink classify-blocks and restore "
             "recall at scale (see BENCH/BASELINE.md envelope section).",
    )
    args = ap.parse_args()

    n = args.records_per_party
    cfg = PPRLConfig(
        rs_size_override=args.rs_size or max(20, n // 1000),
        matching_threshold=0.6,               # the golden-gate operating point
        purge_max_block_size=20000,
    )
    shuffle_parts = max(64, n // 4000)
    spark = get_spark(
        app_name=f"envelope-{n}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=shuffle_parts,
    )
    spark.sparkContext.setLogLevel("ERROR")

    records, ref = fixtures.spark_party_records_distributed(
        spark, n, overlap=args.overlap, typo_rate=args.typo_rate, seed=42
    )

    # warm-up outside the timed window (same policy as every campaign)
    warm_recs, warm_ref = fixtures.spark_party_records_distributed(
        spark, 2000, overlap=args.overlap, typo_rate=args.typo_rate, seed=7
    )
    run_pipeline(
        spark, warm_recs, warm_ref,
        PPRLConfig(rs_size_override=20, matching_threshold=0.6,
                   purge_max_block_size=20000),
        with_clusters=False, with_metrics=True,
    )

    # load gate (VERDICT r4 next #6): the r4 envelope row ran at 1-min
    # load 26-34 and was therefore labeled correctness-only; gating the
    # start makes the wall/pairs-per-sec line quotable as throughput
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_scaling import wait_for_quiet  # noqa: E402

    load_at_start = wait_for_quiet(max_load=2.0, timeout_s=1800)

    t0 = time.time()
    res = run_pipeline(
        spark, records, ref, cfg, with_clusters=False, with_metrics=True
    )
    m = res.metrics.as_dict()
    wall = time.time() - t0

    print(json.dumps({
        "records_per_party": m["n_alice"],
        "cpus": args.cpus,
        "shuffle_partitions": shuffle_parts,
        "wall_sec": round(wall, 3),
        "pairs_scored": m["n_candidates"],
        "pairs_per_sec": round(m["n_candidates"] / wall, 1),
        "expected_matches": m["expected_matches"],
        "f1": round(m["f1"], 6),
        "pairs_completeness": round(m["pairs_completeness"], 6),
        "precision": round(m["precision"], 6),
        "reduction_ratio": round(m["reduction_ratio"], 6),
        "rs_size": cfg.rs_size_override,
        "overlap": args.overlap,
        "typo_rate": args.typo_rate,
        "load_1min_at_start": round(load_at_start, 2),
        "load_1min_at_end": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
