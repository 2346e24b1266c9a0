"""MinHash-dedup kernel profiler over a SAVED documents table (north-rule
dedup row). Runs the full near-dup pipeline — portable shingles -> 64-hash
MinHash signatures (one groupBy, map-side partial agg) -> 16-band LSH bucket
join -> candidate pair count — at a fixed core count and prints ONE JSON
line. Runs in its own process because a local-mode JVM cannot change core
count after start.

Usage: dedup_profile.py CORES DOCS_PATH [SP]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cores = int(sys.argv[1])
    docs_path = sys.argv[2]
    sp = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)

    from kaminpar_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )
    from kaminpar_spark.session import get_spark

    spark = get_spark("dedup_profile", cores=cores, shuffle_partitions=sp)
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()  # warm the page cache outside the timed window

    t0 = time.time()
    sh = shingles(docs, portable=True)
    sigs = minhash_signatures(sh, num_hashes=64)
    # max_bucket_size arms the skew circuit breaker — the configuration a
    # 100 TB corpus would run with (a boilerplate mega-group otherwise lands
    # its quadratic bucket join in one task per band; measured 0.59
    # efficiency on the pre-fix self-similar corpus). On the prime-mixed
    # corpus no bucket exceeds the planted pair size, so the cap never binds.
    n_pairs = lsh_candidate_pairs(sigs, bands=16, max_bucket_size=1000).count()
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n_docs,
                "n_candidate_pairs": n_pairs,
                "wall_sec": round(wall, 1),
                "docs_per_sec": round(n_docs / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
