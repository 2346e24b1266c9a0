"""Scaling-efficiency protocol (BASELINE.json north rule).

Runs the SAME job (PageRank + LPA supersteps over the transcript-derived edge
table) on the SAME input at two parallelism levels — local[8] as "N
executors" and local[32] as "4N executors" — and reports throughput at both
plus scaling efficiency = (T_8 / T_32) / 4. Results are written to
BENCH/BASELINE.md.

Each level runs in its OWN subprocess (a JVM can't change core count after
start), via bench.py with SPARK_GRAFT_CPUS set. The input is scaled up with
SPARK_GRAFT_BENCH_CONVS so per-superstep work dominates fixed job overhead —
the same reason the reference benchmarks at large n (a 60k-edge graph
measures scheduler latency, not throughput).

Usage: python scripts/scaling_bench.py [--convs 600000] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, env_extra: dict[str, str]) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=3000,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "600000")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--levels", default="8,32")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    env_extra = {
        "SPARK_GRAFT_SF_DIR": args.sf_dir,
        "SPARK_GRAFT_BENCH_CONVS": str(args.convs),
    }
    results = {}
    for cpus in (lo, hi):
        print(f"== running local[{cpus}] ==", flush=True)
        results[cpus] = run_level(cpus, env_extra)
        print(json.dumps(results[cpus]), flush=True)

    t_lo = results[lo]["queries"]["pagerank"] + results[lo]["queries"]["lpa"]
    t_hi = results[hi]["queries"]["pagerank"] + results[hi]["queries"]["lpa"]
    ratio = hi / lo
    speedup = t_lo / t_hi if t_hi > 0 else 0.0
    efficiency = speedup / ratio

    md = f"""# BENCH / BASELINE — measured scaling (north rule)

Protocol: identical job + identical input at two parallelism levels —
`local[{lo}]` stands in for N executors, `local[{hi}]` for {ratio:.0f}N
(BASELINE.md sandbox protocol row). Workload: {results[lo]['graph']['supersteps']}
supersteps of PageRank + LPA over the transcript-derived edge table
({results[lo]['graph']['nodes']:,} nodes, {results[lo]['graph']['half_edges']:,}
half-edges, synthesized at {args.convs:,} conversations).

| parallelism | PR+LPA wall (s) | edges/sec/superstep | full bench JSON |
|---|---|---|---|
| local[{lo}] | {t_lo:.1f} | {results[lo]['value']:,.0f} | `{json.dumps(results[lo]['queries'])}` |
| local[{hi}] | {t_hi:.1f} | {results[hi]['value']:,.0f} | `{json.dumps(results[hi]['queries'])}` |

- **speedup {lo}->{hi} cores: {speedup:.2f}x** (ideal {ratio:.0f}x)
- **scaling efficiency: {efficiency:.2f}** (target >= 0.8 per BASELINE.json)

Notes: single machine, so "executors" share memory bandwidth — a real 4N
cluster adds network shuffle but also 4x aggregate memory bandwidth and page
cache; local[{hi}] is the pessimistic stand-in. Fixed per-superstep driver
overhead (~0.3-1 s: planning + job launch) is amortized by the large input;
at small inputs it dominates and no parallelism helps (measured and excluded).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
