"""GraphFrame: the engine's core data structure.

The reference stores an immutable CSR adjacency array over four flat arrays
(/root/reference/kaminpar/datastructure/graph.h:79-181: ``_nodes``, ``_edges``,
``_node_weights``, ``_edge_weights``). The Spark-native equivalent is an
**edge DataFrame** ``(src:long, dst:long, weight:long)``, symmetric (every
undirected edge materialized as both half-edges, mirroring the reference's
half-edge invariant, graph_utils.cc:15-40), hash-partitioned by ``src`` and
optionally *salted* for high-degree hubs, plus a **node DataFrame**
``(id:long, weight:long)``.

The CSR arrays exist only transiently inside Arrow batches of pandas-UDF
kernels; the distributed representation stays relational so Catalyst can plan
joins/aggregations.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.LongType(), False),
    ]
)

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("weight", T.LongType(), False),
    ]
)


@dataclass
class GraphFrame:
    """Immutable symmetric weighted graph as DataFrames.

    edges: (src, dst, weight) — symmetric half-edges, no self-loops.
    nodes: (id, weight) — covers every endpoint plus isolated nodes.
    """

    edges: DataFrame
    nodes: DataFrame
    # Populated by .prepare(): hubs DataFrame (id, n_salts) and the salt factor.
    salt_factor: int = 1
    hubs: DataFrame | None = None
    _prepared: bool = field(default=False, repr=False)
    # True when `nodes` was derived from the edge endpoints (from_edge_pairs
    # with nodes=None) — lets prepare() rebuild it from the persisted edge
    # cache instead of dragging the full upstream lineage into every
    # node-table consumer.
    _nodes_derived: bool = field(default=False, repr=False)

    # ---------------------------------------------------------------- build
    @staticmethod
    def from_edge_pairs(
        pairs: DataFrame,
        nodes: DataFrame | None = None,
        symmetrize: bool = True,
        combine_parallel: bool = True,
    ) -> "GraphFrame":
        """Build from a possibly-directed (src, dst[, weight]) DataFrame.

        Parallel edges are combined by summing weights (the reference's
        converter dedups via its dynamic builder, apps/tools/converter/
        snap.h:11-33); self-loops dropped (graph_contraction.cc:117-119
        semantics).
        """
        cols = pairs.columns
        e = pairs.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            (F.col("weight") if "weight" in cols else F.lit(1)).cast("long").alias("weight"),
        ).where(F.col("src") != F.col("dst"))
        if symmetrize:
            e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
        if combine_parallel:
            e = e.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
        derived = nodes is None
        if derived:
            nodes = (
                e.select(F.col("src").alias("id"))
                .distinct()
                .withColumn("weight", F.lit(1).cast("long"))
            )
        else:
            ncols = nodes.columns
            nodes = nodes.select(
                F.col("id").cast("long"),
                (F.col("weight") if "weight" in ncols else F.lit(1)).cast("long").alias("weight"),
            )
        return GraphFrame(edges=e, nodes=nodes, _nodes_derived=derived)

    # ------------------------------------------------------------- measures
    def num_nodes(self) -> int:
        return self.nodes.count()

    def num_half_edges(self) -> int:
        return self.edges.count()

    def total_node_weight(self) -> int:
        """graph.cc:13-35 eager aggregate — here a lazy agg (computed on demand)."""
        return self.nodes.agg(F.sum("weight")).first()[0] or 0

    def total_edge_weight(self) -> int:
        return self.edges.agg(F.sum("weight")).first()[0] or 0

    def max_node_weight(self) -> int:
        return self.nodes.agg(F.max("weight")).first()[0] or 0

    def degrees(self) -> DataFrame:
        """(id, degree, weighted_degree) for every node (0 for isolated).

        Reference: degree(u) = nodes[u+1]-nodes[u] (graph.h:121-123); weighted
        degree at initial_refiner.h:370-376. One hash aggregate; partial+final
        combine handled by Catalyst.
        """
        d = self.edges.groupBy("src").agg(
            F.count("*").alias("degree"), F.sum("weight").alias("weighted_degree")
        )
        return (
            self.nodes.select("id")
            .join(d.hint("shuffle_hash"), self.nodes.id == d.src, "left")
            .select(
                "id",
                F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
                F.coalesce("weighted_degree", F.lit(0)).cast("long").alias("weighted_degree"),
            )
        )

    def degree_buckets(self) -> DataFrame:
        """Power-of-2 degree histogram: bucket b holds degree in [2^(b-1), 2^b).

        Reference: degree_bucket(deg) = deg==0 ? 0 : floor_log2(deg)+1
        (graph.cc:6-7); histogram tool at apps/tools/graph_statistics.cc:147-152.
        """
        return (
            self.degrees()
            .select(
                F.when(F.col("degree") == 0, F.lit(0))
                .otherwise(F.floor(F.log2("degree")) + 1)
                .cast("int")
                .alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias("n_nodes"))
        )

    # ------------------------------------------------------------ invariants
    def asymmetric_edges(self) -> DataFrame:
        """Half-edges whose reverse (with equal weight) is missing.

        Spark form of validate_graph (graph_utils.cc:15-40): an anti-join of
        the edge table against its own transpose must be empty.
        """
        rev = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight")
        )
        return self.edges.join(rev, ["src", "dst", "weight"], "left_anti")

    def validate(self) -> None:
        bad = self.asymmetric_edges().limit(1).count()
        if bad:
            raise AssertionError("graph is not symmetric (missing reverse half-edges)")
        loops = self.edges.where(F.col("src") == F.col("dst")).limit(1).count()
        if loops:
            raise AssertionError("graph contains self-loops")

    # ------------------------------------------------------------- transforms
    def isolated_nodes(self) -> DataFrame:
        """Nodes with degree 0 (graph_utils.cc:217-239) via anti-join."""
        return self.nodes.join(
            self.edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
        )

    def without_isolated_nodes(self) -> "GraphFrame":
        """Drop degree-0 nodes (graph_utils.cc:241-290). Epsilon rescaling is
        scalar driver math — see functions.rules.adapt_epsilon_after_isolated_removal."""
        keep = self.edges.select(F.col("src").alias("id")).distinct()
        return GraphFrame(edges=self.edges, nodes=self.nodes.join(keep, "id", "left_semi"))

    def subgraph(self, members: DataFrame) -> "GraphFrame":
        """Induced subgraph on ``members(id)`` (extract_subgraphs.cc:143-207):
        semi-join both endpoints; node ids are NOT renumbered (callers that
        need dense ids compose with ids.dense_ids)."""
        m = members.select("id")
        e = (
            self.edges.join(m.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(m.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst", "weight")
        )
        return GraphFrame(edges=e, nodes=self.nodes.join(m, "id", "left_semi"))

    # -------------------------------------------------------------- prepare
    def prepare(
        self,
        num_partitions: int | None = None,
        hub_degree_threshold: int = 1 << 14,
        salt_factor: int = 8,
        spark: SparkSession | None = None,
    ) -> "GraphFrame":
        """Materialize the scale layout: salted, src-hash-partitioned edge blocks.

        The reference *skips* nodes with degree >= large_degree_threshold in LP
        (parallel_label_propagation.h:200). We instead *salt* them (north
        rule): a hub ``src`` with degree d >= threshold gets its edges spread
        over ``salt_factor`` sub-partitions via ``salt = pmod(xxhash64(dst),
        S)``; every gather join then joins on (src, salt) with the small state
        side exploded over the hub's salts. Partial aggregation recombines.

        The returned GraphFrame's ``edges`` carry a ``salt`` column and are
        hash-partitioned by (src, salt) and persisted, so the per-superstep
        gather join never re-shuffles the (large) edge side.
        """
        spark = spark or SparkSession.getActiveSession()
        num_partitions = num_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        # Materialize the edge table ONCE before the two consumers below:
        # without this, the hub-degree job and the salted persist each drag
        # the full upstream lineage (ETL window + dense-id joins) through a
        # separate execution — prepare paid the whole ETL twice (measured
        # ~2x prepare wall at sf0.1).
        from kaminpar_spark.plans.lineage import truncate

        base = truncate(self.edges)
        deg = base.groupBy("src").agg(F.count("*").alias("degree"))
        hubs = deg.where(F.col("degree") >= hub_degree_threshold).select(
            F.col("src").alias("id"), F.lit(salt_factor).alias("n_salts")
        )
        hubs = hubs.persist()
        n_hubs = hubs.count()  # materialize; hub set is small by construction
        e = base.join(
            F.broadcast(hubs), base.src == hubs.id, "left"
        ).select(
            "src",
            "dst",
            "weight",
            F.when(
                F.col("n_salts").isNotNull(),
                F.pmod(F.xxhash64("dst"), F.lit(salt_factor)),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("salt"),
        )
        e = e.repartition(num_partitions, "src", "salt").persist()
        e.count()
        from kaminpar_spark.plans.lineage import release

        release(base)  # salted layout is materialized; drop the staging copy
        # Rebuild a derived node table from the now-persisted edges: the
        # original `nodes` plan hangs off the full upstream lineage (ETL,
        # dense-ids, ...), which every consumer (num_nodes, each operator's
        # init state) would otherwise recompute from scratch — measured 10s
        # per consumer at sf0.1 vs <1s for a distinct over the edge cache.
        # Explicit node tables (weights / isolated nodes) are kept as-is.
        if self._nodes_derived:
            nodes = (
                e.select(F.col("src").alias("id"))
                .distinct()
                .withColumn("weight", F.lit(1).cast("long"))
                .persist()
            )
        else:
            nodes = self.nodes
        prepared = GraphFrame(
            edges=e,
            nodes=nodes,
            salt_factor=salt_factor if n_hubs else 1,
            hubs=hubs if n_hubs else None,
            _nodes_derived=self._nodes_derived,
        )
        prepared._prepared = True
        return prepared

    def salted_state(self, state: DataFrame) -> DataFrame:
        """Explode a vertex-state DataFrame (keyed ``id``) over hub salts so it
        can equi-join prepared edges on (src==id, salt). Non-hub rows get the
        single salt 0."""
        if not self._prepared or self.hubs is None:
            return state.withColumn("salt", F.lit(0).cast("int"))
        s = state.join(F.broadcast(self.hubs.select("id", "n_salts")), "id", "left")
        return (
            s.withColumn(
                "salt",
                F.explode(
                    F.when(
                        F.col("n_salts").isNotNull(),
                        F.sequence(F.lit(0), F.col("n_salts") - 1),
                    ).otherwise(F.array(F.lit(0)))
                ),
            )
            .withColumn("salt", F.col("salt").cast("int"))
            .drop("n_salts")
        )

    def gather(self, state: DataFrame, value_cols: list[str]) -> DataFrame:
        """THE join of the engine (J1, parallel_label_propagation.h:278-286):
        attach per-``src`` vertex state to every half-edge. Returns
        (src, dst, weight, *value_cols); aggregate by ``dst`` downstream to
        implement scatter-sum/min/argmax. Uses the salted layout when prepared
        so the edge side's partitioning is reused superstep over superstep."""
        if self._prepared:
            # Join-strategy note (measured at 9.45M half-edges, 750k nodes):
            # lineage.truncate resets the state leaf's stats to
            # defaultSizeInBytes (= huge), so unhinted the planner sort-merge-
            # joins — sorting the m-scale edge side EVERY superstep (PR
            # superstep 15s). broadcast() fixes the sort but serializes a
            # driver-side relation build per superstep (12s). SHUFFLE_HASH is
            # right at every scale: the persisted edge side's (src, salt)
            # hash partitioning is reused (no exchange, no sort); only the
            # n-scale state shuffles, and the per-partition build is n /
            # num_partitions rows (1.4s, and scales with cores).
            s = self.salted_state(state.select("id", *value_cols)).hint("shuffle_hash")
            return self.edges.join(
                s, (self.edges.src == s.id) & (self.edges.salt == s.salt), "inner"
            ).select("src", "dst", "weight", *value_cols)
        # Unprepared path: same hint rationale — truncated leaves carry
        # defaultSizeInBytes stats, so the unhinted planner sort-merge-joins
        # and SORTS the m-scale edge side even for a one-shot gather.
        s = state.select("id", *value_cols).hint("shuffle_hash")
        return self.edges.join(s, self.edges.src == s.id, "inner").select(
            "src", "dst", "weight", *value_cols
        )

    def unpersist(self) -> None:
        if self._prepared:
            self.edges.unpersist()
            if self._nodes_derived:
                self.nodes.unpersist()
            if self.hubs is not None:
                self.hubs.unpersist()
