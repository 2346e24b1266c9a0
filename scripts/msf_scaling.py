"""Fifth scaling-evidence row: Boruvka MSF (bounded 2 rounds x 2 union
steps — the driver-query kernel shape) over the SAME pre-built 36M-conv edge
table and the SAME protocol as scripts/scaling_bench.py (local[2] = N,
local[8] = 4N). Writes BENCH/MSF_SCALING.md.

Usage: python scripts/msf_scaling.py [--workdir /tmp/kaminpar_scale]
       [--convs 36000000] [--levels 2,8] [--rounds 2] [--union-steps 2]
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
from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.mst import boruvka_msf
from kaminpar_spark.session import get_spark
spark = get_spark("msf_profile", cores={cores}, shuffle_partitions={sp},
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})
g = GraphFrame(edges=spark.read.parquet({edges!r}), nodes=spark.read.parquet({nodes!r}))
n, m = g.num_nodes(), g.num_half_edges()
t0 = time.time()
msf, _ = boruvka_msf(g, rounds={rounds}, union_steps={union_steps})
forest_edges = msf.count()
wall = time.time() - t0
print(json.dumps({{"cores": {cores}, "n": n, "m": m,
                   "msf_sec": round(wall, 1), "forest_edges": forest_edges,
                   "edges_per_sec_per_round": round(m * {rounds} / wall, 1)}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/kaminpar_scale")
    ap.add_argument("--convs", type=int, default=36000000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--union-steps", type=int, default=0,
                    help="0 = run each round's label union to convergence "
                         "(true Boruvka — at 9M components the bounded "
                         "2-step union leaves chains unmerged)")
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
            union_steps=args.union_steps if args.union_steps > 0 else None,
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
    speedup = results[lo]["msf_sec"] / results[hi]["msf_sec"]
    eff = speedup / (hi / lo)
    r = results[hi]
    md = f"""# MSF-kernel scaling (same protocol as BENCH/BASELINE.md)

Boruvka minimum-spanning-forest kernel ({args.rounds} rounds, label unions
run to convergence per round — per-round m-scale label joins +
per-component min-struct argmax, crossed-set shrink between rounds) over
the SAME pre-built {args.convs:,}-conv edge table
({r['n']:,} nodes, {r['m']:,} half-edges, {r['forest_edges']:,} forest
edges picked), shuffle partitions {args.sp}, fresh subprocess per level.

| parallelism | MSF wall (s) | edges/sec/round |
|---|---|---|
| local[{lo}] | {results[lo]['msf_sec']} | {results[lo]['edges_per_sec_per_round']:,.0f} |
| local[{hi}] | {results[hi]['msf_sec']} | {results[hi]['edges_per_sec_per_round']:,.0f} |

- **speedup local[{lo}] -> local[{hi}]: {speedup:.2f}x** (ideal {hi // lo}x)
- **scaling efficiency: {eff:.2f}** (target >= 0.8 per BASELINE.json)

Reproduce: `python scripts/msf_scaling.py --levels {lo},{hi}`
"""
    out_path = os.path.join(REPO, "BENCH", "MSF_SCALING.md")
    with open(out_path, "w") as f:
        f.write(md)
    print(f"wrote {out_path}\nefficiency={eff:.2f}")


if __name__ == "__main__":
    main()
