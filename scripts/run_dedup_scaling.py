"""Run the two-parallelism scaling campaign for the DEDUP path.

Usage: python scripts/run_dedup_scaling.py [--n 2] [--inflate 8] [--submit]

Same protocol as scripts/run_scaling.py (interleaved best-of-N trials,
load-gated starts, min-wall statistic, spark-submit --py-files launch
with --submit) applied to scripts/dedup_scaling.py — the MinHash-LSH ->
exact-Jaccard verify -> connected-components canonical-dedup pipeline.
Appends a "Dedup-path scaling" section to BENCH/BASELINE.md instead of
rewriting it (the PPRL headline stays authoritative for the north rule).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from run_scaling import wait_for_quiet  # noqa: E402


def run_one(cpus: int, inflate: int, submit: bool) -> dict:
    load = wait_for_quiet()
    script = os.path.join(ROOT, "scripts", "dedup_scaling.py")
    if submit:
        cmd = [os.path.join(ROOT, "scripts", "submit.sh"), script,
               "--cpus", str(cpus), "--inflate", str(inflate)]
    else:
        cmd = [sys.executable, script, "--cpus", str(cpus), "--inflate", str(inflate)]
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
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--inflate", type=int, default=8)
    ap.add_argument("--submit", action="store_true")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    n, n4 = args.n, 4 * args.n
    small_runs, big_runs = [], []
    for _ in range(args.trials):
        small_runs.append(run_one(n, args.inflate, args.submit))
        big_runs.append(run_one(n4, args.inflate, args.submit))
    r_small = min(small_runs, key=lambda r: r["wall_sec"])
    r_big = min(big_runs, key=lambda r: r["wall_sec"])
    eff = (r_small["wall_sec"] / r_big["wall_sec"]) / 4.0
    same = (r_small["n_rows"], r_small["n_clusters"]) == (r_big["n_rows"], r_big["n_clusters"])
    trials_md = "\n".join(
        f"| local[{c}] | {r['wall_sec']} | {r['load_at_start']} |"
        for c, runs in ((n, small_runs), (n4, big_runs)) for r in runs
    )
    launcher = "spark-submit --py-files (scripts/submit.sh)" if args.submit else "python"
    md = f"""

## Dedup-path scaling (same protocol, second pipeline)

Generated {datetime.datetime.now(datetime.timezone.utc).isoformat(timespec='seconds')} by `python
scripts/run_dedup_scaling.py --n {n} --inflate {args.inflate}{' --submit' if args.submit else ''}`
(launcher: {launcher}; interleaved best-of-{args.trials}, load-gated,
min-wall — identical protocol to the headline above). Job: the full
canonical-dedup pipeline (MinHash signatures -> banded LSH candidate
join -> exact-Jaccard verify on xxhash64 gram sets -> iterative
connected components -> canonical survivors) on sf0.1 documents
deterministically inflated x{args.inflate} into near-dup families
({r_small['n_docs']:,} docs).

| parallelism | wall sec | docs/sec |
| --- | --- | --- |
| local[{n}] (N) | {r_small['wall_sec']} | {r_small['docs_per_sec']:,} |
| local[{n4}] (4N) | {r_big['wall_sec']} | {r_big['docs_per_sec']:,} |

**Scaling efficiency (T_N / T_4N) / 4 = {eff:.3f}.** Outputs identical at
both levels: {r_small['n_rows']:,} rows, {r_small['n_clusters']:,} clusters
(identical = {same}).

| level | wall sec | load at start |
| --- | --- | --- |
{trials_md}
"""
    path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(md)
    print(json.dumps({"efficiency": round(eff, 3), "identical": same,
                      "n": r_small, "n4": r_big}))
    print(f"appended to {path}")


if __name__ == "__main__":
    main()
