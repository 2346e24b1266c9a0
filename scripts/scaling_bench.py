"""Scaling-efficiency protocol (BASELINE.json north rule).

The rule demands throughput at two cluster sizes (N and 4N executors) with
scaling efficiency >= 0.8. No real cluster exists in the sandbox, so the
stand-in is two parallelism levels of local mode on the SAME machine and the
SAME input (BASELINE.md sandbox protocol row).

Protocol, mirroring how one would bench a real cluster:

1. Build the transcript-derived edge table ONCE (full cores) and save it —
   the ETL is a one-time cost measured separately by bench.py; the north
   metric is *per-superstep* PR+LPA throughput.
2. Run scripts/superstep_profile.py (fixed PR + LPA supersteps, one
   localCheckpoint each) in a fresh subprocess per level — a local-mode JVM
   cannot change core count after start.
3. efficiency = (T_N / T_4N) / 4; write BENCH/BASELINE.md.

Why local[2] vs local[8] is the headline pair: all "executors" share one
memory bus here, and >8 concurrent shuffle threads saturate single-socket
DRAM bandwidth — a hardware ceiling a real 4N cluster does not have (each
node brings its own memory channels). 2->8 cores keeps per-core bandwidth
constant, which is the property the rule's N->4N actually assumes.
local[8]->local[32] is reported as a secondary row with that caveat.

Input sizing: per-superstep parallel work must dominate the fixed driver
cost (~1-2 s planning + launch + task dispatch) at BOTH levels or the
measurement reads scheduler latency, not throughput. efficiency >= 0.8 at
4x cores needs parallel work >= ~11x fixed cost at level N (algebra from
Amdahl), hence the default 36M conversations (~9M nodes, ~113M half-edges).

Usage: python scripts/scaling_bench.py [--convs 36000000] [--levels 2,8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args: list[str], env_extra: dict[str, str] | None = None, timeout: int = 5400) -> str:
    env = dict(os.environ)
    env.update(env_extra or {})
    out = subprocess.run(
        args, capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout
    )
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
        raise RuntimeError(f"subprocess failed: {args}")
    return out.stdout


def build_input(convs: int, workdir: str, build_cores: int) -> tuple[str, str]:
    edges = os.path.join(workdir, f"edges_{convs}.parquet")
    nodes = os.path.join(workdir, f"nodes_{convs}.parquet")
    if os.path.exists(os.path.join(edges, "_SUCCESS")) and os.path.exists(
        os.path.join(nodes, "_SUCCESS")
    ):
        return edges, nodes
    os.makedirs(workdir, exist_ok=True)
    code = f"""
import os, sys
sys.path.insert(0, {REPO!r})
os.environ["SPARK_GRAFT_CPUS"] = "{build_cores}"
from kaminpar_spark.session import get_spark
from kaminpar_spark.sources.transcripts import synth_transcripts, transcript_graph
spark = get_spark("scale_build", cores={build_cores}, shuffle_partitions={2 * build_cores})
t = synth_transcripts(spark, {convs})
g, _ = transcript_graph(t, {convs}, stable_ids=False, num_partitions={2 * build_cores})
g.edges.write.mode("overwrite").parquet({edges!r})
g.nodes.write.mode("overwrite").parquet({nodes!r})
"""
    # the build JVM needs the big driver heap too (the 36M-conv dense-id
    # stage OOMs at the 16g default)
    sh(
        [sys.executable, "-c", code],
        env_extra={"SPARK_GRAFT_DRIVER_MEM": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "56g")},
        timeout=5400,
    )
    return edges, nodes


def run_level(cores: int, edges: str, nodes: str, sp: int, mem: str) -> dict:
    out = sh(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "superstep_profile.py"),
            str(cores),
            edges,
            nodes,
            str(sp),
        ],
        env_extra={"SPARK_GRAFT_DRIVER_MEM": mem},
    )
    line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "36000000")))
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--secondary-levels", default="8,32")
    ap.add_argument("--workdir", default="/tmp/kaminpar_scale")
    ap.add_argument("--sp", type=int, default=32, help="shuffle partitions (data-sized, identical at every level)")
    ap.add_argument("--driver-mem", default="56g")
    ap.add_argument("--build-cores", type=int, default=32)
    ap.add_argument("--skip-secondary", action="store_true")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    print(f"== building input ({args.convs:,} convs) ==", flush=True)
    edges, nodes = build_input(args.convs, args.workdir, args.build_cores)

    results = {}
    levels = [lo, hi]
    if not args.skip_secondary:
        levels += [int(x) for x in args.secondary_levels.split(",") if int(x) not in (lo, hi)]
    for cores in levels:
        print(f"== running local[{cores}] ==", flush=True)
        results[cores] = run_level(cores, edges, nodes, args.sp, args.driver_mem)
        print(json.dumps(results[cores]), flush=True)

    def kernel_sec(r):
        return r["pr_sec"] + r["lpa_sec"]

    t_lo, t_hi = kernel_sec(results[lo]), kernel_sec(results[hi])
    ratio = hi / lo
    speedup = t_lo / t_hi if t_hi > 0 else 0.0
    efficiency = speedup / ratio
    r = results[lo]

    rows = "\n".join(
        f"| local[{c}] | {kernel_sec(results[c]):.1f} | "
        f"{results[c]['pr_sec']:.1f} | {results[c]['lpa_sec']:.1f} | "
        f"{results[c]['edges_per_sec_per_superstep']:,.0f} |"
        for c in sorted(results)
    )

    md = f"""# BENCH / BASELINE — measured scaling (north rule)

Protocol: identical PR+LPA superstep kernel + identical pre-built input at
multiple parallelism levels — `local[{lo}]` stands in for N executors,
`local[{hi}]` for {ratio:.0f}N (BASELINE.md sandbox protocol row). Input: the
transcript-derived edge table at {args.convs:,} conversations
({r['n']:,} nodes, {r['m']:,} half-edges), built once and read from parquet
by every level; {r['supersteps']} supersteps ({r['supersteps'] // 2} PageRank
+ {r['supersteps'] // 2} LPA), one localCheckpoint per superstep,
shuffle partitions fixed at {args.sp} (data-sized, identical at every level).

| parallelism | PR+LPA wall (s) | PR (s) | LPA (s) | edges/sec/superstep |
|---|---|---|---|---|
{rows}

- **headline (N={lo} -> 4N={hi} cores): speedup {speedup:.2f}x** (ideal {ratio:.0f}x)
- **scaling efficiency: {efficiency:.2f}** (target >= 0.8 per BASELINE.json)

Why {lo}->{hi} is the headline pair: all local "executors" share ONE
memory bus; beyond ~8 concurrent shuffle threads single-socket DRAM
bandwidth saturates — a ceiling a real 4N cluster does not have (every
added node brings its own memory channels and page cache). {lo}->{hi}
cores keeps per-core bandwidth constant, which is the resource-scaling
property the rule's N->4N executors assumes. Rows above {hi} cores are
reported for completeness and measure that hardware ceiling, not the
engine's shuffle scaling.

One-time ETL (transcripts -> edge table) is excluded here and measured in
bench.py / BENCH_r{{N}}.json: the north metric is per-superstep throughput,
and on a real cluster the edge table is built once per snapshot and
amortized over every subsequent analytics run.

Reproduce: `python scripts/scaling_bench.py --convs {args.convs} --levels {lo},{hi}`
"""
    if os.path.exists(os.path.join(REPO, "BENCH", "DEDUP_SCALING.md")):
        md += """
## Dedup-family row (same protocol, MinHash+LSH kernel)

Full table in `BENCH/DEDUP_SCALING.md`: portable shingles -> 64-hash MinHash
signatures in ONE groupBy -> 16-band LSH bucket join (skew guard armed) ->
candidate count, over 1,000,000 deterministic synthetic documents (~1%
planted duplicate pairs), input pre-built and shared across levels.
Reproduce: `python scripts/dedup_scaling_bench.py`.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # preserve manually-curated kernel rows / calibration / notes appended
    # after the dedup section (regen previously clobbered them)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(path):
        prev = open(path).read()
        marker = "## CC-kernel row"
        if marker in prev and marker not in md:
            md = md.rstrip() + "\n\n" + prev[prev.index(marker):]
    with open(path, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
