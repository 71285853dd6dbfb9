"""Graph traversal operators: gatherNodes()/nodes(), shortestPath(), {!graph}.

Reference semantics:
  * gatherNodes() — breadth-first expansion across (from, to) edge fields, one
    level per call, with per-node aggregations and cycle avoidance
    (solr/solrj-streaming/.../io/graph/GatherNodesStream.java:72, ~905 LoC).
  * shortestPath() — iterative BFS between two nodes with path reconstruction
    (io/graph/ShortestPathStream.java:64).
  * {!graph} query — follow from->to edges to a fixpoint, optionally depth-capped
    (solr/core/src/java/org/apache/solr/search/join/GraphQuery.java:64,143).

Spark shape: each BFS level is one equi-join frontier -> edges, with the visited
set kept as a DataFrame and anti-joined to avoid revisits. The reference walks
term postings per level inside one shard; here each level is a distributed join,
so a 100-TB edge table traverses with ordinary shuffle/broadcast machinery, and
iteration count — not data size — bounds the driver loop. Frontiers are
checkpoint-persisted each level to cut the growing lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gather_nodes(edges: DataFrame, roots: DataFrame, from_col: str, to_col: str,
                 levels: int = 1) -> DataFrame:
    """BFS expansion: nodes reachable from `roots` in exactly 1..levels hops.

    roots: DataFrame with column `node`. Returns (node, level) with the MINIMUM
    level each node was first reached at (the reference's cycle-avoidance rule:
    a node already gathered is not re-emitted).
    """
    visited = roots.select(F.col("node"), F.lit(0).alias("level"))
    frontier = visited.select("node")
    out = visited
    for lvl in range(1, levels + 1):
        nxt = (edges.join(frontier.withColumnRenamed("node", from_col), from_col)
                    .select(F.col(to_col).alias("node")).distinct()
                    .join(out.select("node"), "node", "left_anti")
                    .withColumn("level", F.lit(lvl)))
        nxt = nxt.localCheckpoint(eager=True)  # cut lineage per level
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt)
        frontier = nxt.select("node")
    return out.where(F.col("level") > 0)


def graph_query(edges: DataFrame, roots: DataFrame, from_col: str, to_col: str,
                max_depth: int = -1) -> DataFrame:
    """{!graph}: transitive closure from roots to fixpoint (or max_depth).

    Returns (node) including the roots, mirroring GraphQuery's result set.
    """
    visited = roots.select("node")
    frontier = visited
    depth = 0
    while max_depth < 0 or depth < max_depth:
        nxt = (edges.join(frontier.withColumnRenamed("node", from_col), from_col)
                    .select(F.col(to_col).alias("node")).distinct()
                    .join(visited, "node", "left_anti"))
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
        depth += 1
    return visited


def shortest_path(edges: DataFrame, src, dst, from_col: str, to_col: str,
                  max_depth: int = 10) -> list:
    """BFS shortest path src -> dst; returns the node list (empty if unreachable).

    Mirrors ShortestPathStream: level-synchronous BFS keeping one best
    predecessor per node, path rebuilt by walking predecessors backwards. The
    predecessor table stays DISTRIBUTED throughout — it can hold billions of
    visited nodes on a 100-TB edge table and is never collected; the backward
    walk issues <= max_depth single-row lookups (each filters the persisted
    preds table down to exactly one node's row).
    """
    spark = edges.sparkSession
    preds = spark.createDataFrame([(src, None)], "node string, pred string") \
        .withColumn("node", F.col("node").cast(edges.schema[from_col].dataType)) \
        .withColumn("pred", F.col("pred").cast(edges.schema[from_col].dataType))
    frontier = preds.select("node")
    for _ in range(max_depth):
        nxt = (edges.join(frontier.withColumnRenamed("node", from_col), from_col)
                    .groupBy(F.col(to_col).alias("node"))
                    .agg(F.min(from_col).alias("pred"))  # deterministic tiebreak
                    .join(preds.select("node"), "node", "left_anti"))
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            return []
        preds = preds.unionByName(nxt)
        if not nxt.where(F.col("node") == dst).isEmpty():
            break
        frontier = nxt.select("node")
    else:
        return []
    # Backward walk: <= max_depth + 1 single-row lookups against the distributed
    # preds table (never a full collect — the table scales with the visited set).
    preds = preds.persist()
    try:
        path, cur = [], dst
        for _ in range(max_depth + 1):
            row = preds.where(F.col("node") == F.lit(cur)).head()
            if row is None:
                return []
            path.append(cur)
            if row["pred"] is None:
                return list(reversed(path))
            cur = row["pred"]
        return []
    finally:
        preds.unpersist()


def connected_components(edges: DataFrame, src_col: str, dst_col: str,
                         max_rounds: int = 50) -> DataFrame:
    """Undirected connected components by alternating large-star / small-star
    contraction — the shuffle-native CC algorithm from the public literature
    (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
    2014). The reference has no CC operator; this is the transitive-closure
    step the near-dup dedup pipeline needs between pair emission
    (minhash/simhash/cosine near_dup_pairs) and survivor selection.

    Returns (id, component_id) for every node incident to an edge, where
    component_id is the component's minimum id (any orderable id type).

    Scale shape: each half-round is one map-side-combinable groupBy (per-node
    neighborhood min) plus one equi-join of the edge list against it — never
    all-pairs, no driver-side state, and the edge set contracts toward star
    graphs in O(log n) rounds. Lineage is cut with an eager localCheckpoint
    per round like the other fixpoint walkers in this module; convergence is
    detected with a (count, xor-of-hashes) edge-set fingerprint, and
    non-convergence within max_rounds fails loudly rather than returning a
    partial clustering.
    """
    e = (edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
              .where(F.col("a") != F.col("b")).distinct())
    nodes = e.select(F.col("a").alias("id")) \
             .union(e.select(F.col("b").alias("id"))).distinct()

    def _fingerprint(df: DataFrame) -> tuple:
        row = df.select(F.count(F.lit(1)).alias("n"),
                        F.bit_xor(F.xxhash64("a", "b")).alias("h")).head()
        return (row["n"], row["h"])

    cur, prev_fp = e, None
    for _ in range(max_rounds):
        sym = cur.union(cur.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
        # large-star(u): every neighbor v > u links to min(N(u) + {u})
        mins = (sym.groupBy("a").agg(F.min("b").alias("mb"))
                   .select("a", F.least("mb", "a").alias("m")))
        large = (sym.join(mins, "a").where(F.col("b") > F.col("a"))
                    .select(F.col("b").alias("a"), F.col("m").alias("b"))
                    .distinct())
        # small-star(u): u and its smaller neighbors link to their min
        # (edges out of large-star are already oriented larger -> smaller)
        mins2 = large.groupBy("a").agg(F.min("b").alias("m"))
        small = (large.join(mins2, "a").where(F.col("b") != F.col("m"))
                      .select(F.col("b").alias("a"), F.col("m").alias("b"))
                      .union(mins2.select("a", F.col("m").alias("b")))
                      .distinct())
        cur = small.localCheckpoint(eager=True)
        fp = _fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")
    comp = (cur.groupBy("a").agg(F.min("b").alias("component_id"))
               .withColumnRenamed("a", "id"))
    return (nodes.join(comp, "id", "left")
                 .select("id", F.coalesce("component_id", "id")
                                .alias("component_id")))


def score_nodes(node_hits: DataFrame, edges: DataFrame, to_col: str) -> DataFrame:
    """scoreNodes(): TF-IDF relevance for traversal-gathered nodes
    (reference: solrj-streaming stream/ScoreNodesStream.java — node count
    from the traversal times an idf from the node's global frequency, so hub
    nodes that appear everywhere rank below selective ones).

    node_hits: (node, count) — occurrence counts local to the traversal
    (e.g. gatherNodes output aggregated before dedup). df(node) = global
    in-degree of the node in `edges`; N = total edge count.

        score = count * ln(1 + N / df)

    Shape: one groupBy over the edge table (map-side combinable), a scalar
    count broadcast into the expression, and a join against the (small)
    gathered node set — broadcastable, so the global in-degree table is the
    only shuffle. Returns (node, count, score).
    """
    n_edges = edges.count()
    indeg = edges.groupBy(F.col(to_col).alias("node")) \
                 .agg(F.count(F.lit(1)).alias("df"))
    return (node_hits.join(indeg, "node", "left")
            .withColumn("score",
                        F.col("count")
                        * F.log1p(F.lit(float(n_edges)) / F.col("df")))
            .select("node", "count", "score"))
