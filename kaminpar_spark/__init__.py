"""kaminpar_spark — a from-scratch PySpark-native link-graph analytics engine.

Capabilities modeled on joonho3020/KaMinPar (multilevel balanced graph
partitioning: coarsen -> initial-partition -> uncoarsen+refine), re-expressed
Spark-first over an edge DataFrame ``(src:long, dst:long, weight:long)``:

- iterative kernels: PageRank, connected components (hash-to-min), label
  propagation (clustering + refinement), triangle counting, k-cores
- graph metrics: edge cut, imbalance, block weights, overload, feasibility
  (reference semantics: /root/reference/kaminpar/utility/metrics.cc)
- multilevel partitioner: LP coarsening + contraction, driver-side initial
  bipartitioning portfolio + 2-way FM, LP refinement + balancer
  (reference pipeline: partitioning_scheme/parallel_recursive_bisection.cc)
- transcript ETL: conversation/agent transcripts -> actor edge table
- training-data pipeline ops: dedup (exact/minhash/simhash/jaccard/cosine),
  similarity search, text analysis, multimodal plumbing

Everything is DataFrame/SQL + Arrow-vectorized pandas UDFs; no per-row Python.
"""

from kaminpar_spark.session import get_spark
from kaminpar_spark.graph import GraphFrame

__all__ = ["get_spark", "GraphFrame"]
__version__ = "0.1.0"
