"""Partition-quality comparison: deep multilevel extension vs rb-at-coarsest
(VERDICT r1 item 5, extended per VERDICT r2 item 6) on the transcript-derived
graph.

Runs Partitioner(scheme="deep") and Partitioner(scheme="rb") over a grid of
(sf_dir, k) cells and writes a markdown table with edge-cut, imbalance, and
feasibility to BENCH/PARTITION_QUALITY.md. Non-power-of-2 k exercises the
final_k/split_integral extension bookkeeping.

Usage: python scripts/partition_quality.py [sf_dir:k1,k2 ...]
Default grid: sf0.01:6,8,16 sf0.1:16,64
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_GRID = [
    ("/root/testdata/sf0.01", [6, 8, 16]),
    ("/root/testdata/sf0.1", [16, 64]),
]


def main():
    if len(sys.argv) > 1:
        grid = []
        for spec in sys.argv[1:]:
            sf_dir, ks = spec.split(":")
            grid.append((sf_dir, [int(k) for k in ks.split(",")]))
    else:
        grid = DEFAULT_GRID

    from kaminpar_spark.plans.partitioner import Partitioner
    from kaminpar_spark.session import get_spark
    from kaminpar_spark.sources.transcripts import synth_transcripts, transcript_graph

    spark = get_spark("partition_quality", cores=16, shuffle_partitions=16)
    rows = []
    sizes = {}
    for sf_dir, ks in grid:
        n_convs = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
        t = synth_transcripts(spark, n_convs)
        g, _ = transcript_graph(t, n_convs, stable_ids=False, num_partitions=16)
        g.nodes.persist()
        g.edges.persist()
        sf = os.path.basename(sf_dir.rstrip("/"))
        sizes[sf] = (g.num_nodes(), g.num_half_edges())
        for k in ks:
            # deep+rep4 = deep schedule with the E9 split-and-join replica
            # tree armed at 4 threads inside every coarsest-graph bisection
            # (mid-coarsening coarsener forks, best-of joins); deep/rb run
            # the single sequential chain (rep threads = 1).
            for scheme, rep in (("deep", 1), ("deep", 4), ("rb", 1)):
                t0 = time.time()
                res = Partitioner(
                    g, spark, contraction_limit=400, seed=42, scheme=scheme,
                    ip_replication_threads=rep,
                ).partition(k, epsilon=0.03)
                wall = time.time() - t0
                rows.append(
                    {
                        "sf": sf,
                        "k": k,
                        "scheme": scheme if rep == 1 else f"{scheme}+rep{rep}",
                        "cut": res.cut,
                        "imbalance": round(res.imbalance, 4),
                        "feasible": res.feasible,
                        "wall_sec": round(wall, 1),
                    }
                )
                print(rows[-1], flush=True)
        g.nodes.unpersist()
        g.edges.unpersist()

    size_lines = [
        f"{sf}: {n:,} nodes, {m:,} half-edges" for sf, (n, m) in sizes.items()
    ]
    md = [
        "# Partition quality: deep multilevel extension vs rb-at-coarsest",
        "",
        "Transcript graphs (" + "; ".join(size_lines) + "),",
        "contraction_limit=400, epsilon=0.03, seed=42. `deep` bisects the",
        "coarsest graph to k'=2^ceil(log2(n/C)) and extends per uncoarsening",
        "level with refinement at every intermediate k (the reference's deep",
        "multilevel schedule, with per-block final_k/split_integral extension",
        "bookkeeping — k=6 exercises the non-power-of-2 path); `deep+rep4`",
        "additionally arms the E9 split-and-join replica tree (4 threads:",
        "mid-coarsening coarsener forks, best-of per join) inside every",
        "coarsest-graph bisection; `rb` bisects to",
        "the final k at the coarsest graph (round-1 behavior).",
        "",
        "| sf | k | scheme | edge cut | imbalance | feasible | wall (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(
            f"| {r['sf']} | {r['k']} | {r['scheme']} | {r['cut']:,} | {r['imbalance']} "
            f"| {r['feasible']} | {r['wall_sec']} |"
        )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "PARTITION_QUALITY.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
