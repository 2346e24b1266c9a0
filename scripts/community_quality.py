"""Community quality grid: multilevel Louvain vs LPA clustering, Newman
modularity on the transcript graph at each SF.

Usage: python scripts/community_quality.py [sf_dirs...]   (default sf0.01 sf0.1)
Writes BENCH/COMMUNITY_QUALITY.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from kaminpar_spark.operators.labelprop import label_propagation
from kaminpar_spark.operators.louvain import louvain
from kaminpar_spark.operators.metrics import modularity
from kaminpar_spark.session import get_spark
from kaminpar_spark.sources.transcripts import synth_transcripts, transcript_graph


def main():
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("community_quality", cores=16, shuffle_partitions=32)
    rows = []
    for sf in sf_dirs:
        n_convs = spark.read.parquet(f"{sf}/orders.parquet").count()
        g, _ = transcript_graph(synth_transcripts(spark, n_convs), n_convs)
        gp = g.prepare(num_partitions=32, spark=spark)
        for name, fn in (
            ("lpa", lambda: label_propagation(gp, max_iters=8, semi_sync=True,
                                              track_convergence=False)),
            ("louvain", lambda: louvain(gp, levels=3, rounds=3)),
        ):
            t0 = time.time()
            labs = fn()
            lab_col = "label" if "label" in labs.columns else "comm"
            labs = labs.select("id", F.col(lab_col).alias("label"))
            n_comms = labs.select("label").distinct().count()
            q = modularity(gp, labs)
            wall = time.time() - t0
            rows.append((sf.rsplit("/", 1)[-1], name, n_comms, q, wall))
            print(rows[-1], flush=True)
    with open("/root/repo/BENCH/COMMUNITY_QUALITY.md", "w") as f:
        f.write(
            "# Community quality: multilevel Louvain vs LPA\n\n"
            "Transcript graph per SF; Newman modularity (operators/metrics.py),\n"
            "LPA = 8 semi-sync supersteps (heaviest-label objective), Louvain =\n"
            "3 levels x 3 move rounds (exact-integer modularity-gain objective,\n"
            "operators/louvain.py). Same prepared graph, local[16].\n\n"
            "| sf | method | communities | modularity | wall (s) |\n"
            "|---|---|---|---|---|\n"
        )
        for sf, name, n_comms, q, wall in rows:
            f.write(f"| {sf} | {name} | {n_comms:,} | {q:.4f} | {wall:.1f} |\n")
    print("wrote BENCH/COMMUNITY_QUALITY.md")


if __name__ == "__main__":
    main()
