"""Scaling-efficiency protocol for the dedup family (VERDICT r2 item 7).

Same two-parallelism-level stand-in as scripts/scaling_bench.py (see its
module docstring for why local[2] -> local[8] mirrors N -> 4N executors):
build a deterministic synthetic corpus ONCE at full cores, then run the
MinHash near-dup kernel (scripts/dedup_profile.py) in a fresh subprocess per
level on the SAME saved parquet. efficiency = (T_N / T_4N) / 4; results are
written to BENCH/DEDUP_SCALING.md (and summarized by hand in
BENCH/BASELINE.md).

Usage: python scripts/dedup_scaling_bench.py [--docs 2000000] [--levels 2,8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args, env_extra=None, timeout=5400):
    env = dict(os.environ)
    env.update(env_extra or {})
    out = subprocess.run(
        args, capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout
    )
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
        raise RuntimeError(f"subprocess failed: {args}")
    return out.stdout


def build_input(n_docs: int, workdir: str, build_cores: int) -> str:
    path = os.path.join(workdir, f"docs_{n_docs}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    os.makedirs(workdir, exist_ok=True)
    code = f"""
import os, sys
sys.path.insert(0, {REPO!r})
os.environ["SPARK_GRAFT_CPUS"] = "{build_cores}"
from kaminpar_spark.session import get_spark
from kaminpar_spark.sources.corpus import synth_documents
spark = get_spark("dedup_build", cores={build_cores}, shuffle_partitions={2 * build_cores})
synth_documents(spark, {n_docs}).repartition({2 * build_cores}).write.mode("overwrite").parquet({path!r})
"""
    sh([sys.executable, "-c", code], timeout=5400)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--secondary-levels", default="32")
    ap.add_argument("--workdir", default="/tmp/kaminpar_dedup_scale")
    ap.add_argument("--sp", type=int, default=32)
    ap.add_argument("--build-cores", type=int, default=32)
    ap.add_argument("--skip-secondary", action="store_true")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    print(f"== building corpus ({args.docs:,} docs) ==", flush=True)
    docs = build_input(args.docs, args.workdir, args.build_cores)

    levels = [lo, hi]
    if not args.skip_secondary:
        levels += [
            int(x) for x in args.secondary_levels.split(",") if int(x) not in (lo, hi)
        ]
    results = {}
    for cores in levels:
        print(f"== running local[{cores}] ==", flush=True)
        out = sh(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "dedup_profile.py"),
                str(cores),
                docs,
                str(args.sp),
            ]
        )
        line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(json.dumps(results[cores]), flush=True)

    t_lo, t_hi = results[lo]["wall_sec"], results[hi]["wall_sec"]
    ratio = hi / lo
    speedup = t_lo / t_hi if t_hi > 0 else 0.0
    efficiency = speedup / ratio
    r = results[lo]

    rows = "\n".join(
        f"| local[{c}] | {results[c]['wall_sec']:.1f} | "
        f"{results[c]['docs_per_sec']:,.0f} | {results[c]['n_candidate_pairs']:,} |"
        for c in sorted(results)
    )
    md = f"""# Dedup-family scaling (MinHash + LSH kernel)

Protocol: identical MinHash near-dup kernel (portable shingles -> 64-hash
signatures in ONE groupBy -> 16-band LSH bucket join -> candidate count) +
identical pre-built corpus at multiple parallelism levels — `local[{lo}]`
stands in for N executors, `local[{hi}]` for {ratio:.0f}N (same sandbox
protocol as BENCH/BASELINE.md). Corpus: {r['n_docs']:,} deterministic
synthetic documents (kaminpar_spark.sources.corpus, ~1% planted duplicates),
built once and read from parquet by every level; shuffle partitions fixed at
{args.sp}.

| parallelism | kernel wall (s) | docs/sec | candidate pairs |
|---|---|---|---|
{rows}

- **headline (N={lo} -> 4N={hi} cores): speedup {speedup:.2f}x** (ideal {ratio:.0f}x)
- **scaling efficiency: {efficiency:.2f}** (target >= 0.8 per BASELINE.json)

Reproduce: `python scripts/dedup_scaling_bench.py --docs {args.docs} --levels {lo},{hi}`
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "DEDUP_SCALING.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
