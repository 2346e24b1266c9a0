"""Hash-partitioned CSR-style adjacency blocks.

The reference's CSR is four flat arrays (kaminpar/datastructure/graph.h:
79-181). The engine's working representation is relational (graph.py) so
Catalyst plans the joins — but for kernel hand-off, snapshot export, and
Arrow-native consumers the SAME adjacency can be materialized as
**hash-partitioned CSR blocks**: one row per block holding the block's
src-sorted offset/index/weight arrays. This is the layout the north star
names (src-sorted edge blocks with per-partition offset arrays); each block
is exactly the CSR slice a pandas-UDF kernel sees in one Arrow batch.

Block key is ``src % num_blocks`` (deterministic and reproducible in ANSI
SQL — an id-space stripe; the engine's runtime layout uses xxhash64 salting
instead, graph.py:204, which beats stripes under id-locality skew but has no
cross-engine twin). Build is ONE groupBy + per-block numpy sorts inside
applyInPandas — vectorized Arrow, no per-row Python. Block sizing is the
caller's contract: num_blocks ≫ executors, so a block ≈ m/num_blocks
half-edges fits an Arrow batch even at 10^12 edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.graph import GraphFrame

CSR_BLOCK_SCHEMA = (
    "block int, ids array<long>, indptr array<long>, "
    "indices array<long>, eweights array<long>"
)


def to_csr_blocks(graph: GraphFrame, num_blocks: int = 32) -> DataFrame:
    """(block, ids, indptr, indices, eweights) — per block: the sorted
    distinct srcs, their offset array (len = len(ids)+1), and the dst/weight
    arrays ordered by (src, dst)."""
    e = graph.edges.select(
        F.pmod(F.col("src"), F.lit(num_blocks)).cast("int").alias("block"),
        "src",
        "dst",
        "weight",
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
        src = pdf["src"].to_numpy()
        ids, counts = np.unique(src, return_counts=True)
        indptr = np.concatenate(([0], np.cumsum(counts)))
        return pd.DataFrame(
            {
                "block": [int(pdf["block"].iloc[0])],
                "ids": [ids.tolist()],
                "indptr": [indptr.tolist()],
                "indices": [pdf["dst"].tolist()],
                "eweights": [pdf["weight"].tolist()],
            }
        )

    return e.groupBy("block").applyInPandas(build, CSR_BLOCK_SCHEMA)


def from_csr_blocks(blocks: DataFrame) -> DataFrame:
    """Inverse: (src, dst, weight) edge table from CSR blocks (numpy repeat
    of ids by offset deltas inside one Arrow pass)."""

    def explode(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                ids = np.asarray(row["ids"], dtype=np.int64)
                indptr = np.asarray(row["indptr"], dtype=np.int64)
                yield pd.DataFrame(
                    {
                        "src": np.repeat(ids, np.diff(indptr)),
                        "dst": np.asarray(row["indices"], dtype=np.int64),
                        "weight": np.asarray(row["eweights"], dtype=np.int64),
                    }
                )

    return blocks.mapInPandas(explode, "src long, dst long, weight long")
