"""Per-superstep PR+LPA profiler over a SAVED edge table (north-rule kernel).

Loads a pre-built transcript-derived graph (edges/nodes parquet written by
scaling_bench.py phase 1), prepares the salted layout, then runs fixed
PageRank and LPA supersteps with one localCheckpoint per superstep —
exactly the kernel the north metric measures ("edges processed/sec per
superstep, PageRank + LPA"). One-time ETL is deliberately excluded: it is
measured separately by bench.py and is not part of the per-superstep
throughput the rule scales.

Runs in its own process because a local-mode JVM cannot change core count
after start. Prints ONE JSON line.

Usage: superstep_profile.py CORES EDGES_PATH NODES_PATH [SP] [STEPS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cores = int(sys.argv[1])
    edges_path, nodes_path = sys.argv[2], sys.argv[3]
    sp = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    steps = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)

    from pyspark.sql import functions as F

    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.labelprop import lp_step
    from kaminpar_spark.operators.pagerank import init_ranks, pagerank_step
    from kaminpar_spark.plans.lineage import release, truncate
    from kaminpar_spark.session import get_spark

    # AQE off for the superstep kernel: shuffle-hash hints + data-sized fixed
    # partitioning leave nothing to re-plan, and AQE's per-stage
    # re-optimization is serial driver latency (see bench.py note).
    spark = get_spark(
        "superstep_profile",
        cores=cores,
        shuffle_partitions=sp,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    g = GraphFrame(
        edges=spark.read.parquet(edges_path), nodes=spark.read.parquet(nodes_path)
    )
    t0 = time.time()
    gp = g.prepare(
        num_partitions=sp, hub_degree_threshold=1 << 13, salt_factor=8, spark=spark
    )
    n, m = gp.num_nodes(), gp.num_half_edges()
    prep = time.time() - t0

    pr_steps = []
    state = truncate(init_ranks(gp, n))
    for _ in range(steps):
        s0 = time.time()
        new = truncate(pagerank_step(gp, state, n, dangling_mass=0.0))
        release(state)
        state = new
        pr_steps.append(round(time.time() - s0, 2))
    release(state)

    lpa_steps = []
    state = truncate(gp.nodes.select("id", F.col("id").alias("label"), "weight"))
    for i in range(steps):
        s0 = time.time()
        new = truncate(lp_step(gp, state, step_idx=i, semi_sync=True))
        release(state)
        state = new
        lpa_steps.append(round(time.time() - s0, 2))

    print(
        json.dumps(
            {
                "cores": cores,
                "sp": sp,
                "n": n,
                "m": m,
                "prep_sec": round(prep, 1),
                "pr_sec": round(sum(pr_steps), 1),
                "pr_steps": pr_steps,
                "lpa_sec": round(sum(lpa_steps), 1),
                "lpa_steps": lpa_steps,
                "supersteps": 2 * steps,
                "edges_per_sec_per_superstep": round(
                    m * 2 * steps / (sum(pr_steps) + sum(lpa_steps)), 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
