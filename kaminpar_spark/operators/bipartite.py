"""Bipartite incidence analytics over the transcript corpus.

The conv-actor incidence (which actors appear in which conversation) is the
bipartite structure the link graph projects away; its 4-cycles ("butterflies",
the bipartite analog of triangles) measure actor co-participation cohesion —
the standard bipartite clustering primitive (Wang et al., "Butterfly counting
in bipartite networks").

Scale shape: the wedge join is per-LEFT-vertex (actors sharing a conversation)
— bounded by actors-per-conversation, which is bounded by turns-per-
conversation, so the self-join never explodes the way an actor-side join
(hub agents in millions of convs) would. The pair aggregate is a hash groupBy
with map-side combine; butterflies = sum C(cnt, 2) over pair multiplicities
needs no second join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def butterfly_count(
    incidence: DataFrame, left: str = "conv_id", right: str = "actor"
) -> DataFrame:
    """One row (co_pairs, wedge_pairs, butterflies) over a bipartite
    incidence table:

    - wedge_pairs: (right, right') pairs co-appearing in >= 1 left vertex,
      counted with multiplicity (= bipartite wedges through a left vertex).
    - co_pairs: distinct co-appearing (right, right') pairs.
    - butterflies: 4-cycles = sum over pairs of C(shared_lefts, 2).
    """
    inc = incidence.select(left, right).distinct()
    a = inc.select(F.col(left).alias("l"), F.col(right).alias("r_a"))
    b = inc.select(F.col(left).alias("l"), F.col(right).alias("r_b"))
    pair_counts = (
        a.join(b, "l")
        .where(F.col("r_a") < F.col("r_b"))
        .groupBy("r_a", "r_b")
        .agg(F.count("*").alias("cnt"))
    )
    return pair_counts.agg(
        F.count("*").cast("long").alias("co_pairs"),
        F.sum("cnt").cast("long").alias("wedge_pairs"),
        F.sum(F.expr("cnt * (cnt - 1) div 2")).cast("long").alias("butterflies"),
    )
