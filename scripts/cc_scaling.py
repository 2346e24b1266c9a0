"""Third scaling-evidence row: connected-components (hash-to-min) supersteps
over the SAME pre-built 36M-conv edge table and the SAME protocol as
scripts/scaling_bench.py (local[2] = N, local[8] = 4N). Appends a CC row
section to BENCH/BASELINE.md is left to the operator table; this script
writes BENCH/CC_SCALING.md.

Usage: python scripts/cc_scaling.py [--workdir /tmp/kaminpar_scale]
       [--convs 36000000] [--levels 2,8] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROFILE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = "{cores}"
from pyspark.sql import functions as F
from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.components import cc_step
from kaminpar_spark.plans.lineage import release, truncate
from kaminpar_spark.session import get_spark
spark = get_spark("cc_profile", cores={cores}, shuffle_partitions={sp},
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})
g = GraphFrame(edges=spark.read.parquet({edges!r}), nodes=spark.read.parquet({nodes!r}))
t0 = time.time()
gp = g.prepare(num_partitions={sp}, hub_degree_threshold=1 << 13, salt_factor=8, spark=spark)
n, m = gp.num_nodes(), gp.num_half_edges()
prep = time.time() - t0
steps = []
state = truncate(gp.nodes.select("id", F.col("id").alias("comp")))
for i in range({steps}):
    s0 = time.time()
    new = truncate(cc_step(gp, state))
    release(state); state = new
    steps.append(round(time.time() - s0, 2))
release(state)
print(json.dumps({{"cores": {cores}, "n": n, "m": m, "cc_sec": round(sum(steps), 1),
                   "cc_steps": steps,
                   "edges_per_sec_per_superstep": round(m * len(steps) / sum(steps), 1)}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/kaminpar_scale")
    ap.add_argument("--convs", type=int, default=36000000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--sp", type=int, default=32)
    args = ap.parse_args()
    edges = os.path.join(args.workdir, f"edges_{args.convs}.parquet")
    nodes = os.path.join(args.workdir, f"nodes_{args.convs}.parquet")
    assert os.path.exists(edges), "run scripts/scaling_bench.py first (builds the input)"

    results = {}
    for cores in (int(x) for x in args.levels.split(",")):
        code = PROFILE.format(
            repo=REPO, cores=cores, sp=args.sp, edges=edges, nodes=nodes, steps=args.steps
        )
        print(f"== running local[{cores}] ==", flush=True)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=5400
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-3000:])
            raise RuntimeError(f"profile failed at cores={cores}")
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line, flush=True)

    lo, hi = sorted(results)
    speedup = results[lo]["cc_sec"] / results[hi]["cc_sec"]
    eff = speedup / (hi / lo)
    r = results[lo]
    rows = "\n".join(
        f"| local[{c}] | {results[c]['cc_sec']} | {results[c]['edges_per_sec_per_superstep']:,.0f} |"
        for c in sorted(results)
    )
    md = f"""# CC-kernel scaling (same protocol as BENCH/BASELINE.md)

Connected-components hash-to-min supersteps ({args.steps} supersteps, one
localCheckpoint each) over the SAME pre-built 36M-conv edge table
({r['n']:,} nodes, {r['m']:,} half-edges), shuffle partitions {args.sp},
fresh subprocess per level.

| parallelism | CC wall (s) | edges/sec/superstep |
|---|---|---|
{rows}

- **speedup local[{lo}] -> local[{hi}]: {speedup:.2f}x** (ideal {hi // lo}x)
- **scaling efficiency: {eff:.2f}** (target >= 0.8 per BASELINE.json)

Reproduce: `python scripts/cc_scaling.py --levels {lo},{hi}`
"""
    with open(os.path.join(REPO, "BENCH", "CC_SCALING.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
