"""DAC2012 netlist converter (SURVEY.md S7).

Reference: apps/tools/converter/dac2012.h:11-61 — reads a DAC2012 placement
benchmark ``.nets`` file and builds a **bipartite net→pin graph**:

- ``NumNets : N`` declares the net count; nets take ids ``0..N-1`` in file
  order (one per ``NetDegree`` header).
- Every non-header line inside a net block names a pin; pin names get dense
  ids ``N, N+1, ...`` in order of first appearance.
- Each pin line adds an undirected unit-weight edge (net, pin); the
  reference's DynamicGraphBuilder dedups repeats.

Like the METIS reader (S1), parsing happens driver-side: the format is a
single sequential text file used only for benchmark interchange — production
input is parquet/Iceberg. The parsed edge list is handed to Spark as a
DataFrame-backed GraphFrame.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kaminpar_spark.graph import GraphFrame


def parse_dac2012(text: str) -> tuple[int, dict[str, int], list[tuple[int, int]]]:
    """Returns (num_nets, pin_name -> id, [(net_id, pin_id)]).

    Mirrors dac2012.h:25-55: the net counter increments on every NetDegree
    header after the first; pins are numbered num_nets + arrival order.
    """
    num_nets = 0
    pin_ids: dict[str, int] = {}
    edges: list[tuple[int, int]] = []
    parsing_net = False
    net = 0
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if num_nets == 0 and line.startswith("NumNets"):
            num_nets = int(line.split(":", 1)[1].strip())
        elif line.startswith("NetDegree"):
            if parsing_net:
                net += 1
            parsing_net = True
            if net >= num_nets:
                raise ValueError(f"more NetDegree blocks than NumNets={num_nets}")
        elif parsing_net:
            pin_name = line.split()[0]
            if pin_name not in pin_ids:
                pin_ids[pin_name] = num_nets + len(pin_ids)
            edges.append((net, pin_ids[pin_name]))
    return num_nets, pin_ids, edges


def read_dac2012(spark: SparkSession, path: str) -> GraphFrame:
    """Netlist file -> bipartite GraphFrame (nets 0..N-1, pins N..).

    Node set covers all declared nets (a net with no parsed pins is an
    isolated node) plus every pin; unit node weights; repeated (net, pin)
    lines merge into one unit edge (the reference builder's dedup, so
    combine_parallel then weight-clamp to 1).
    """
    with open(path) as f:
        num_nets, pin_ids, edges = parse_dac2012(f.read())
    n_total = num_nets + len(pin_ids)
    e = spark.createDataFrame(
        list(dict.fromkeys(edges)) or [(0, 0)], "src long, dst long"
    )
    if not edges:
        e = e.limit(0)
    nodes = spark.range(n_total).selectExpr("id", "cast(1 as long) as weight")
    return GraphFrame.from_edge_pairs(e, nodes=nodes, symmetrize=True)
