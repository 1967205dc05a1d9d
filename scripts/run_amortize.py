"""Orchestrate the fixed-overhead amortization campaign: each headline
path at inflate 1 vs 8, two interleaved passes (per-config MIN — the
shared-box noise statistic bench.py also uses), load-gated between runs.
Appends one JSON line per run to BENCH/amortize_runs.jsonl and prints a
summary table; the narrative table lives in BENCH/AMORTIZE.md.

Usage: python scripts/run_amortize.py [--inflate 8] [--passes 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from run_scaling import wait_for_quiet  # noqa: E402

PATHS = ["dedup", "decontaminate", "pprl"]


def run_one(path: str, inflate: int) -> dict:
    load = wait_for_quiet(max_load=2.0, timeout_s=900)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "amortize_bench.py"),
         "--path", path, "--inflate", str(inflate)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            r = json.loads(line)
            r["load_at_start"] = round(load, 2)
            return r
    raise RuntimeError(f"no JSON for {path}@{inflate}: {out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inflate", type=int, default=8)
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    log = os.path.join(ROOT, "BENCH", "amortize_runs.jsonl")
    best: dict[tuple[str, int], float] = {}
    with open(log, "a") as f:
        for p in range(args.passes):
            for path in PATHS:
                for inflate in (1, args.inflate):
                    r = run_one(path, inflate)
                    r["pass"] = p
                    f.write(json.dumps(r) + "\n")
                    f.flush()
                    key = (path, inflate)
                    best[key] = min(best.get(key, 1e18), r["wall_sec"])
                    print(json.dumps(r), flush=True)

    print("\npath | wall@1 | wall@%d | growth (ideal %d.0x)" % (args.inflate, args.inflate))
    for path in PATHS:
        w1, wn = best[(path, 1)], best[(path, args.inflate)]
        print(f"{path} | {w1:.2f}s | {wn:.2f}s | {wn / w1:.2f}x")


if __name__ == "__main__":
    main()
