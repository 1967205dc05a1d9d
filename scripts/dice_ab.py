"""Isolated-stage A/B for the Dice pair-stream wire format (VERDICT r4
next #3): dense packed-int64 CLKs vs sparse smallint set-bit positions.

The Dice attach-joins' pair stream is the engine's dominant shuffle load
(~13 GB at inflate 64; the named cause of the inflate-64 0.769 and the
8->32 0.568 bus-bound regimes in BENCH/BASELINE.md). This probe measures
the stage those bytes ride — candidates x blooms attach + Dice score to
one aggregate — with BOTH wire formats over IDENTICAL pre-materialized
inputs, in the SHUFFLE-JOIN regime (autoBroadcastJoinThreshold=-1: at
cluster scale the bloom relation is petabytes and the attach joins are
shuffled/bucketed joins, which is exactly the regime byte-slimming
targets; the sandbox-scale AQE-broadcast regime is measured too for
headline parity). Shuffle bytes come from the Spark UI REST API
(per-stage shuffleWrite accumulated across each timed arm).

Outputs one JSON line per arm; orchestrate/interleave via --trials.
Match counts must be identical across arms (asserted) — representation
equivalence is also property-tested in tests/test_bloom.py.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scalable_blocking_for_privacy_preserving_record_linkage_spark.config import PPRLConfig  # noqa: E402
from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators import (  # noqa: E402
    blocking, classify, matching, window,
)
from scalable_blocking_for_privacy_preserving_record_linkage_spark.plans import testdata  # noqa: E402
from scalable_blocking_for_privacy_preserving_record_linkage_spark.session import get_spark  # noqa: E402
from scalable_blocking_for_privacy_preserving_record_linkage_spark.sources import extract  # noqa: E402
from scalable_blocking_for_privacy_preserving_record_linkage_spark.sources.io import ensure_parallelism  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import SCALING_CFG, inflated_records  # noqa: E402


def _stage_metrics(ui: str, app_id: str) -> dict[str, int]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return {
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--inflate", type=int, default=16)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--broadcast", action="store_true",
                    help="measure the sandbox AQE-broadcast regime instead "
                    "of the cluster shuffle-join regime")
    ap.add_argument("--shuffle-hash", action="store_true",
                    help="hint SHUFFLE_HASH on the bloom sides (only "
                    "meaningful without --broadcast)")
    ap.add_argument("--workdir", default="/tmp/dice_ab")
    args = ap.parse_args()

    shuffle_parts = max(32, args.inflate * 2)
    spark = get_spark(
        app_name=f"dice-ab-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=shuffle_parts,
        extra_conf={"spark.ui.enabled": "true"},  # REST stage metrics
    )
    if not args.broadcast:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    cfg = SCALING_CFG
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir, exist_ok=True)

    # ---- setup, OUTSIDE every timed window: one candidate-pair table and
    # one encoded CLK table per representation, all materialized to
    # parquet so every arm reads byte-identical inputs
    records = inflated_records(spark, args.sf_dir, args.inflate)
    normalized = ensure_parallelism(extract.normalize_records(records, cfg)).cache()
    party_counts = {
        r["party"]: r["count"] for r in normalized.groupBy("party").count().collect()
    }
    rs = testdata.reference_sets_from_records(records, cfg)
    samples = classify.build_reference_samples(rs, cfg, max(party_counts.values()))
    classified = classify.classify(spark, normalized, samples, cfg)
    elements = blocking.purge_blocks(blocking.block_ids(classified, cfg), cfg)
    window.candidate_pairs(elements, cfg).write.mode("overwrite").parquet(
        f"{args.workdir}/candidates"
    )
    for rep in ("dense", "sparse"):
        matching.encode_blooms(normalized, cfg, representation=rep).write.mode(
            "overwrite"
        ).parquet(f"{args.workdir}/blooms_{rep}")
    normalized.unpersist()

    candidates = spark.read.parquet(f"{args.workdir}/candidates")
    n_cand = candidates.count()

    def arm(rep: str, warm: bool = False):
        blooms = spark.read.parquet(f"{args.workdir}/blooms_{rep}")
        cand = candidates.limit(4096) if warm else candidates
        blooms_a, blooms_b = matching.split_blooms(blooms, cfg)
        if args.shuffle_hash and not args.broadcast:
            blooms_a, blooms_b = blooms_a.hint("SHUFFLE_HASH"), blooms_b.hint("SHUFFLE_HASH")
        scored = matching.score_joined(
            matching.attach_blooms_presplit(cand, blooms_a, blooms_b),
            cfg,
            unfiltered=True,
        )
        agg = scored.agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.count(
                F.when(F.col("matched_fields") >= cfg.matches_to_accept, 1)
            ).alias("n_matches"),
        )
        before = _stage_metrics(ui, app_id)
        t0 = time.time()
        row = agg.collect()[0]
        wall = time.time() - t0
        after = _stage_metrics(ui, app_id)
        return {
            "rep": rep,
            "wall_sec": round(wall, 3),
            "pairs": row["n_candidates"],
            "matches": row["n_matches"],
            "shuffle_write_bytes": after["shuffle_write"] - before["shuffle_write"],
            "shuffle_read_bytes": after["shuffle_read"] - before["shuffle_read"],
        }

    # codegen/worker warm-up per representation, untimed
    arm("dense", warm=True)
    arm("sparse", warm=True)

    results = []
    for t in range(args.trials):
        for rep in ("dense", "sparse"):  # interleaved trials
            r = arm(rep)
            r["trial"] = t
            results.append(r)
            print(json.dumps(r), flush=True)

    best = {
        rep: min((r for r in results if r["rep"] == rep), key=lambda r: r["wall_sec"])
        for rep in ("dense", "sparse")
    }
    assert best["dense"]["matches"] == best["sparse"]["matches"], "match-set drift!"
    assert best["dense"]["pairs"] == best["sparse"]["pairs"] == n_cand
    print(json.dumps({
        "summary": True,
        "regime": ("broadcast" if args.broadcast
                   else ("shuffle_hash" if args.shuffle_hash else "smj")),
        "inflate": args.inflate,
        "cpus": args.cpus,
        "pairs": n_cand,
        "dense_wall": best["dense"]["wall_sec"],
        "sparse_wall": best["sparse"]["wall_sec"],
        "dense_shuffle_write": best["dense"]["shuffle_write_bytes"],
        "sparse_shuffle_write": best["sparse"]["shuffle_write_bytes"],
        "bytes_ratio": round(
            best["dense"]["shuffle_write_bytes"]
            / max(1, best["sparse"]["shuffle_write_bytes"]), 3),
        "wall_ratio": round(
            best["dense"]["wall_sec"] / max(1e-9, best["sparse"]["wall_sec"]), 3),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
