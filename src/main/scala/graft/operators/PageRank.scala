package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Lineage.CutOps

/** Weighted PageRank over an edge list, in EXACT integer arithmetic.
  *
  * Ranks are parts-per-`scale` longs and every step is integer multiply /
  * integer `div` / integer sum — no floating point anywhere — so a run is
  * bit-reproducible across engines and partitionings (double summation
  * would be merge-order dependent), at the cost of ≤1 unit truncation
  * loss per edge per iteration. That loss is deterministic too: an
  * unrolled SQL oracle reproduces the output exactly.
  *
  * Per iteration (the classic damped update, reference behavior per the
  * survey's analytics scope; no counterpart file in the reference — this
  * is an engine extension):
  *
  *   r'(v) = ((100-d)·scale) div (100·n)                    // teleport
  *         + Σ_{e:(u,v,w)} (r(u)·d·w) div (100·outW(u))     // flow
  *         + (d·Σ_{dangling u} r(u)) div (100·n)            // dangling
  *
  * Spark shape: the per-iteration join keys edges on src against the
  * rank table, aggregates contributions by dst (map-side combinable
  * BIGINT sum), and re-attaches the node universe with a left join —
  * two shuffles per iteration, the minimum for Pregel-on-DataFrames.
  * `localCheckpoint` truncates the growing lineage every iteration (the
  * same pattern as [[ConnectedComponents]]); at cluster scale swap it
  * for a reliable checkpoint dir. The rank table is (node, long) — tiny
  * relative to edges — and the edge / out-weight / dangling-node tables
  * are materialized exactly once up front, so the caller's edge
  * pipeline is never re-executed per iteration.
  */
object PageRank {

  /** `edges`: (src, dst, w: long, all non-null, w > 0). Returns
    * (node, rank) with rank in parts-per-`scale`. Nodes are the union of
    * both endpoint columns (pass `allNodes` to include isolated ones —
    * they still receive teleport + dangling mass each round). */
  def ranks(edges: DataFrame, iterations: Int = 5, dampingPct: Int = 85,
      scale: Long = 1000000000L, allNodes: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 0 && dampingPct >= 0 && dampingPct <= 100)
    // Materialize the edge list ONCE. `e` is referenced by every
    // iteration (plus nodes/outW below); without the cut the caller's
    // whole edge-construction pipeline (corpus scan + window + groupBy
    // for q103/q208, token explode + groupBy for q209) re-executes
    // `iterations`+2 times — measured 7× the upstream cost at 5 rounds.
    // Materialized hash-partitioned by `src` (guide §2.4): the cut
    // preserves the layout, so outW's groupBy and every round's
    // edge⋈rank join REUSE it instead of re-exchanging the edge side —
    // locally masked by AQE broadcasting the node-sized rank table,
    // asserted under the cluster shape in EdgeLayoutSpec.
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .repartition(col("src"))
      .cut()
    val nodes = {
      val fromEdges = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node")))
      allNodes.map(a => fromEdges.unionByName(a.select(col(a.columns.head).as("node"))))
        .getOrElse(fromEdges).distinct()
    }.cut()
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
      .cut()
    // node count as a 1-row frame, broadcast into every rank row — the
    // count never touches the driver, so the same plan runs at any n
    val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))
    // nodes with no out-edges, computed ONCE — each round's dangling
    // mass is then a semi-join of the rank table against this (usually
    // tiny) set instead of a fresh anti-join against all of outW
    val danglingNodes = nodes
      .join(outW.select(col("src").as("node")), Seq("node"), "left_anti")
      .cut()

    var r = nodes.crossJoin(nRow)
      .select(col("node"), expr(s"${scale}L div n").as("rank"))
      .cut()
    for (_ <- 0 until iterations) {
      // flow: each edge carries (r(src)·d·w) div (100·outW(src)) to dst
      val contrib = e
        .join(r.withColumnRenamed("node", "src"), "src")
        .join(outW, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr(s"(rank * $dampingPct * w) div (100 * outw)")).as("contrib"))
      // dangling mass: rank held by nodes with no out-edges
      val dangling = broadcast(
        r.join(danglingNodes, Seq("node"), "left_semi")
          .agg(coalesce(sum(col("rank")), lit(0L)).as("dm")))
      r = nodes.crossJoin(nRow).crossJoin(dangling)
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (expr(s"((${100 - dampingPct}) * ${scale}L) div (100 * n)") +
            coalesce(col("contrib"), lit(0L)) +
            expr(s"($dampingPct * dm) div (100 * n)")).as("rank"))
        .cut()
    }
    r
  }

  /** Personalized PageRank: identical integer recurrence, but the
    * teleport AND the dangling redistribution both land entirely on the
    * `seed` node (the restart vector is a point mass), and the initial
    * rank is all-at-seed — so rank(v) is exactly "random-walk-with-
    * restart affinity of v to the seed", the graded relevance score a
    * contamination trace or related-item expansion wants. Same
    * bit-reproducibility contract as [[ranks]]: every step is integer,
    * an unrolled SQL oracle matches exactly.
    *
    *   r0(v)  = [v = seed]·scale
    *   r'(v)  = [v = seed]·( ((100−d)·scale) div 100 + (d·dm) div 100 )
    *          + Σ_{e:(u,v,w)} (r(u)·d·w) div (100·outW(u))
    *
    * Spark shape per iteration: the same two shuffles as [[ranks]]
    * (contribution aggregate + node-universe left join); the seed mask
    * is a pure projection. */
  def personalizedRanks(edges: DataFrame, seed: Any, iterations: Int = 5,
      dampingPct: Int = 85, scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 0 && dampingPct >= 0 && dampingPct <= 100)
    // one materialization of the caller's edge pipeline, laid out by
    // `src` for the per-round join (see ranks)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .repartition(col("src"))
      .cut()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().cut()
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
      .cut()
    val danglingNodes = nodes
      .join(outW.select(col("src").as("node")), Seq("node"), "left_anti")
      .cut()
    val isSeed = col("node") === lit(seed)
    var r = nodes
      .select(col("node"), when(isSeed, lit(scale)).otherwise(lit(0L)).as("rank"))
      .cut()
    for (_ <- 0 until iterations) {
      val contrib = e
        .join(r.withColumnRenamed("node", "src"), "src")
        .join(outW, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr(s"(rank * $dampingPct * w) div (100 * outw)")).as("contrib"))
      val dangling = broadcast(
        r.join(danglingNodes, Seq("node"), "left_semi")
          .agg(coalesce(sum(col("rank")), lit(0L)).as("dm")))
      r = nodes.crossJoin(dangling)
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (when(isSeed,
            expr(s"((${100 - dampingPct}) * ${scale}L) div 100") +
              expr(s"($dampingPct * dm) div 100")).otherwise(lit(0L)) +
            coalesce(col("contrib"), lit(0L))).as("rank"))
        .cut()
    }
    r
  }
}
