"""Coarsener comparison: LP clustering vs heavy-edge matching (HEM) inside
the same deep-multilevel pipeline, on the transcript graph. Writes
BENCH/COARSENER_QUALITY.md.

Usage: python scripts/coarsener_quality.py [sf_dir] [k ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ks = [int(k) for k in sys.argv[2:]] or [8]

    from kaminpar_spark.plans.partitioner import Partitioner
    from kaminpar_spark.session import get_spark
    from kaminpar_spark.sources.transcripts import synth_transcripts, transcript_graph

    spark = get_spark("coarsener_quality", cores=16, shuffle_partitions=16)
    n_convs = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    t = synth_transcripts(spark, n_convs)
    g, _ = transcript_graph(t, n_convs, stable_ids=False, num_partitions=16)
    g.nodes.persist()
    g.edges.persist()
    n, m = g.num_nodes(), g.num_half_edges()

    rows = []
    for k in ks:
        for coarsener in ("lp", "hem"):
            t0 = time.time()
            res = Partitioner(
                g, spark, contraction_limit=400, seed=42, coarsener=coarsener
            ).partition(k, epsilon=0.03)
            levels = sum(1 for l in res.levels if l["stage"] == "coarsen")
            rows.append(
                {
                    "k": k,
                    "coarsener": coarsener,
                    "levels": levels,
                    "cut": res.cut,
                    "imbalance": round(res.imbalance, 4),
                    "feasible": res.feasible,
                    "wall_sec": round(time.time() - t0, 1),
                }
            )
            print(rows[-1], flush=True)

    sf = os.path.basename(sf_dir.rstrip("/"))
    md = [
        "# Coarsener quality: LP clustering vs heavy-edge matching",
        "",
        f"Transcript graph {sf} ({n:,} nodes, {m:,} half-edges),",
        "deep scheme, contraction_limit=400, epsilon=0.03, seed=42. `lp` is",
        "the reference's size-constrained label-propagation clustering;",
        "`hem` is the METIS-family heavy-edge matching (operators/matching.py)",
        "run through the same contraction/uncoarsening pipeline. Matching",
        "halves the graph at most per level, so it takes more levels; on",
        "hub-heavy graphs LP's many-to-one clusters shrink faster and cheaper",
        "— which is exactly the reference's stated reason for preferring",
        "clustering over matching (README.MD:83-105).",
        "",
        "| k | coarsener | coarsen levels | edge cut | imbalance | feasible | wall (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(
            f"| {r['k']} | {r['coarsener']} | {r['levels']} | {r['cut']:,} "
            f"| {r['imbalance']} | {r['feasible']} | {r['wall_sec']} |"
        )
    with open(os.path.join(REPO, "BENCH", "COARSENER_QUALITY.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
