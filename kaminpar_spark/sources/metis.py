"""METIS graph text format reader/writer (SURVEY.md S1/S2).

Reference: kaminpar/io.cc:194-266 (mmap + hand-rolled scanner). Our reader
parses the small test fixtures in pure Python and hands Spark a DataFrame —
METIS text is a single-file, inherently sequential format used only for
cross-checking against the reference; production input is parquet/Iceberg.

Format: header ``n m [fmt [ncon]]`` where fmt is a 3-digit flag string
<has_node_weights><has_edge_weights> in its last two digits; then one line
per node: ``[node_weight] (neighbor edge_weight?)*`` with 1-based neighbor
ids. ``%`` lines are comments (io.cc:111-141).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kaminpar_spark.graph import GraphFrame


def parse_metis(text: str) -> tuple[list[tuple[int, int, int]], list[int]]:
    """Returns (half_edges [(u, v, w)], node_weights). 0-based ids."""
    lines = [ln.strip() for ln in text.splitlines()]
    lines = [ln for ln in lines if ln and not ln.startswith("%")]
    header = lines[0].split()
    n = int(header[0])
    fmt = header[2] if len(header) > 2 else "0"
    has_nw = len(fmt) >= 2 and fmt[-2] == "1"
    has_ew = fmt[-1] == "1"
    node_weights: list[int] = []
    edges: list[tuple[int, int, int]] = []
    for u, line in enumerate(lines[1 : n + 1]):
        toks = [int(t) for t in line.split()]
        i = 0
        if has_nw:
            node_weights.append(toks[0])
            i = 1
        else:
            node_weights.append(1)
        while i < len(toks):
            v = toks[i] - 1  # 1-based -> 0-based
            i += 1
            w = 1
            if has_ew:
                w = toks[i]
                i += 1
            edges.append((u, v, w))
    return edges, node_weights


def read_metis(spark: SparkSession, path: str) -> GraphFrame:
    with open(path) as f:
        edges, node_weights = parse_metis(f.read())
    e = spark.createDataFrame(edges or [(0, 0, 0)], "src long, dst long, weight long")
    if not edges:
        e = e.limit(0)
    nodes = spark.createDataFrame(
        [(i, w) for i, w in enumerate(node_weights)], "id long, weight long"
    )
    # METIS stores both half-edges already; don't re-symmetrize
    return GraphFrame.from_edge_pairs(e, nodes=nodes, symmetrize=False, combine_parallel=False)


def write_metis(graph: GraphFrame, path: str) -> None:
    """Emit METIS text (io.cc:143-175): header + 1-based adjacency lines.
    Collects to the driver — fixture-scale export only."""
    nodes = sorted(
        ((r["id"], r["weight"]) for r in graph.nodes.collect()), key=lambda t: t[0]
    )
    adj: dict[int, list[tuple[int, int]]] = {i: [] for i, _ in nodes}
    for r in graph.edges.collect():
        adj[r["src"]].append((r["dst"], r["weight"]))
    n = len(nodes)
    m = sum(len(v) for v in adj.values()) // 2
    has_nw = any(w != 1 for _, w in nodes)
    has_ew = any(w != 1 for lst in adj.values() for _, w in lst)
    fmt = f"{int(has_nw)}{int(has_ew)}"
    with open(path, "w") as f:
        f.write(f"{n} {m} {fmt}\n" if (has_nw or has_ew) else f"{n} {m}\n")
        for i, w in nodes:
            parts: list[str] = []
            if has_nw:
                parts.append(str(w))
            for v, ew in sorted(adj[i]):
                parts.append(str(v + 1))
                if has_ew:
                    parts.append(str(ew))
            f.write(" ".join(parts) + "\n")
