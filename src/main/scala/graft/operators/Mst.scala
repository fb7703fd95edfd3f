package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed minimum-spanning-forest via Borůvka's algorithm.
  *
  * Borůvka is THE MST algorithm that parallelizes: every round each
  * component independently picks its cheapest outgoing edge (a map-side
  * min per component label), the picked edges merge components (a
  * connected-components contraction on the COMPONENT graph, which is at
  * most one node per component — exponentially smaller each round), and
  * the component count at least halves — O(log n) rounds total, each
  * round a constant number of hash joins and min-aggregations. No
  * priority queue, no sequential frontier: Prim/Kruskal's global
  * ordered structure is exactly what a 1000-executor cluster cannot
  * share, Borůvka needs only per-key mins.
  *
  * Weights must be a TOTAL order for the forest to be unique — callers
  * pass integer weights and the implementation breaks ties by
  * (w, a, b) lexicographic struct ordering, so equal-weight edges
  * resolve identically on any cluster layout, any round count, and in
  * the sequential Prim twin the spec checks against.
  */
object Mst {

  /** Minimum-spanning forest of the undirected weighted graph `edges`
    * (columns `a` < `b` node ids, `w` integral weight; one row per
    * edge). Returns the forest's edges (`a`, `b`, `w`) — n − #components
    * rows. `maxIter` backstops the component-halving guarantee
    * (2^20 components is past any realistic graph; hitting it throws
    * rather than returning a partial forest — the CC discipline). */
  def boruvka(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val nodes = edges.select(col("a").as("id"))
      .unionByName(edges.select(col("b").as("id"))).distinct()
    var comp = nodes.withColumn("comp", col("id")).localCheckpoint(true)
    val e0 = edges.select("a", "b", "w").localCheckpoint(true)
    var mst: DataFrame = null
    var done = false
    var iter = 0
    while (!done && iter < maxIter) {
      // label both endpoints with their current component
      val cross = e0
        .join(comp.select(col("id").as("a"), col("comp").as("ca")), "a")
        .join(comp.select(col("id").as("b"), col("comp").as("cb")), "b")
        .where(col("ca") =!= col("cb"))
        .localCheckpoint(true) // reused twice below; also cuts lineage
      if (cross.isEmpty) done = true
      else {
        // each component is offered every incident cross edge; min by
        // the (w, a, b) total order picks its cheapest outgoing edge
        val offers = cross.select(col("ca").as("c"),
            struct(col("w"), col("a"), col("b"), col("cb").as("oc")).as("e"))
          .unionByName(cross.select(col("cb").as("c"),
            struct(col("w"), col("a"), col("b"), col("ca").as("oc")).as("e")))
        val sel = offers.groupBy("c").agg(min("e").as("e"))
          .select(col("c"), col("e.w").as("w"), col("e.a").as("a"),
            col("e.b").as("b"), col("e.oc").as("oc"))
          .localCheckpoint(true)
        // two components may pick the same edge — it joins them once
        val picked = sel.select("a", "b", "w").distinct()
        mst = if (mst == null) picked.localCheckpoint(true)
              else mst.unionByName(picked).localCheckpoint(true)
        // contract: CC over the component graph (≤ one edge per
        // component — tiny relative to the data graph)
        val labels = ConnectedComponents.components(
          sel.select(col("c").as("src"), col("oc").as("dst")))
        comp = comp
          .join(labels.select(col("id").as("comp"), col("component")),
            Seq("comp"), "left")
          .select(col("id"),
            coalesce(col("component"), col("comp")).as("comp"))
          .localCheckpoint(true)
        iter += 1
      }
    }
    if (!done) throw new IllegalStateException(
      s"Boruvka did not converge within $maxIter rounds - component " +
        "halving guarantees O(log n); raise maxIter for graphs past " +
        "2^" + maxIter + " nodes")
    if (mst == null) e0.limit(0) else mst
  }
}
