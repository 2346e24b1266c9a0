"""Fourth scaling-evidence row: ANF bit_or OR-mask supersteps over the SAME
pre-built 36M-conv edge table and the SAME protocol as
scripts/scaling_bench.py (local[2] = N, local[8] = 4N). Writes
BENCH/ANF_SCALING.md.

Usage: python scripts/anf_scaling.py [--workdir /tmp/kaminpar_scale]
       [--convs 36000000] [--levels 2,8] [--rounds 3]
(builds the input via scripts/scaling_bench.build_input if missing)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PROFILE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = "{cores}"
from pyspark.sql import functions as F
from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.anf import anf_round, init_masks
from kaminpar_spark.plans.lineage import release, truncate
from kaminpar_spark.session import get_spark
spark = get_spark("anf_profile", cores={cores}, shuffle_partitions={sp},
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})
g = GraphFrame(edges=spark.read.parquet({edges!r}), nodes=spark.read.parquet({nodes!r}))
gp = g.prepare(num_partitions={sp}, hub_degree_threshold=1 << 13, salt_factor=8, spark=spark)
n, m = gp.num_nodes(), gp.num_half_edges()
steps = []
state = truncate(init_masks(gp.nodes, 4))
for i in range({rounds}):
    s0 = time.time()
    new = truncate(anf_round(gp, state, 4))
    release(state); state = new
    steps.append(round(time.time() - s0, 2))
release(state)
print(json.dumps({{"cores": {cores}, "n": n, "m": m, "anf_sec": round(sum(steps), 1),
                   "anf_steps": steps,
                   "edges_per_sec_per_superstep": round(m * len(steps) / sum(steps), 1)}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/kaminpar_scale")
    ap.add_argument("--convs", type=int, default=36000000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sp", type=int, default=32)
    ap.add_argument("--build-cores", type=int, default=32)
    args = ap.parse_args()

    from scaling_bench import build_input

    edges, nodes = build_input(args.convs, args.workdir, args.build_cores)

    results = {}
    for cores in (int(x) for x in args.levels.split(",")):
        code = PROFILE.format(
            repo=REPO, cores=cores, sp=args.sp, edges=edges, nodes=nodes,
            rounds=args.rounds,
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
    speedup = results[lo]["anf_sec"] / results[hi]["anf_sec"]
    eff = speedup / (hi / lo)
    r = results[hi]
    md = f"""# ANF-kernel scaling (same protocol as BENCH/BASELINE.md)

ANF Flajolet-Martin OR-mask supersteps ({args.rounds} supersteps of
4x `bit_or` hash aggregates, one localCheckpoint each) over the SAME
pre-built {args.convs:,}-conv edge table ({r['n']:,} nodes,
{r['m']:,} half-edges), shuffle partitions {args.sp}, fresh subprocess
per level.

| parallelism | ANF wall (s) | edges/sec/superstep |
|---|---|---|
| local[{lo}] | {results[lo]['anf_sec']} | {results[lo]['edges_per_sec_per_superstep']:,.0f} |
| local[{hi}] | {results[hi]['anf_sec']} | {results[hi]['edges_per_sec_per_superstep']:,.0f} |

- **speedup local[{lo}] -> local[{hi}]: {speedup:.2f}x** (ideal {hi // lo}x)
- **scaling efficiency: {eff:.2f}** (target >= 0.8 per BASELINE.json)

Reproduce: `python scripts/anf_scaling.py --levels {lo},{hi}`
"""
    out_path = os.path.join(REPO, "BENCH", "ANF_SCALING.md")
    with open(out_path, "w") as f:
        f.write(md)
    print(f"wrote {out_path}\nefficiency={eff:.2f}")


if __name__ == "__main__":
    main()
