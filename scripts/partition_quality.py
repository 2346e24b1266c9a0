"""Partition-quality comparison: deep multilevel extension vs rb-at-coarsest
(VERDICT r1 item 5) on the transcript-derived graph.

Runs Partitioner(scheme="deep") and Partitioner(scheme="rb") at k in
{8, 16} on the sf0.01 transcript graph and writes a markdown table with
edge-cut, imbalance, and feasibility to BENCH/PARTITION_QUALITY.md.

Usage: python scripts/partition_quality.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from kaminpar_spark.plans.partitioner import Partitioner
    from kaminpar_spark.session import get_spark
    from kaminpar_spark.sources.transcripts import synth_transcripts, transcript_graph

    spark = get_spark("partition_quality", cores=16, shuffle_partitions=16)
    n_convs = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    t = synth_transcripts(spark, n_convs)
    g, _ = transcript_graph(t, n_convs, stable_ids=False, num_partitions=16)
    n, m = g.num_nodes(), g.num_half_edges()

    rows = []
    for k in (8, 16):
        for scheme in ("deep", "rb"):
            t0 = time.time()
            res = Partitioner(
                g, spark, contraction_limit=400, seed=42, scheme=scheme
            ).partition(k, epsilon=0.03)
            wall = time.time() - t0
            rows.append(
                {
                    "k": k,
                    "scheme": scheme,
                    "cut": res.cut,
                    "imbalance": round(res.imbalance, 4),
                    "feasible": res.feasible,
                    "wall_sec": round(wall, 1),
                }
            )
            print(rows[-1], flush=True)

    md = [
        "# Partition quality: deep multilevel extension vs rb-at-coarsest",
        "",
        f"Transcript graph at {sf_dir} ({n:,} nodes, {m:,} half-edges),",
        "contraction_limit=400, epsilon=0.03, seed=42. `deep` bisects the",
        "coarsest graph to k'=2^ceil(log2(n/C)) and extends per uncoarsening",
        "level with refinement at every intermediate k (the reference's deep",
        "multilevel schedule); `rb` bisects to the final k at the coarsest",
        "graph (round-1 behavior).",
        "",
        "| k | scheme | edge cut | imbalance | feasible | wall (s) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(
            f"| {r['k']} | {r['scheme']} | {r['cut']:,} | {r['imbalance']} "
            f"| {r['feasible']} | {r['wall_sec']} |"
        )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "PARTITION_QUALITY.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
