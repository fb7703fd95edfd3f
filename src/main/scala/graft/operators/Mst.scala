package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Lineage.CutOps

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
  def boruvka(edges: DataFrame, maxIter: Int = 20,
      assumeMaterialized: Boolean = false): DataFrame = {
    // materialize the caller's edge pipeline ONCE, and derive the node
    // universe from the materialized copy — nodes-before-e0 re-executed
    // the (potentially expensive: q197/q202 feed a whole kNN build in
    // here) upstream pipeline a second time. `assumeMaterialized` skips
    // the cut for callers that hand in an already-checkpointed frame
    // (q202 cuts the same edge list for its own node universe — the
    // double cut held TWO block-manager copies of the edge data for the
    // query's lifetime; ADVICE r12)
    val e0 = if (assumeMaterialized) edges.select("a", "b", "w")
             else edges.select("a", "b", "w").cut()
    val nodes = e0.select(col("a").as("id"))
      .unionByName(e0.select(col("b").as("id"))).distinct()
    var comp = nodes.withColumn("comp", col("id")).cut()
    var mst: DataFrame = null
    var done = false
    var iter = 0
    while (!done && iter < maxIter) {
      // label both endpoints with their current component
      val cross = e0
        .join(comp.select(col("id").as("a"), col("comp").as("ca")), "a")
        .join(comp.select(col("id").as("b"), col("comp").as("cb")), "b")
        .where(col("ca") =!= col("cb"))
        .cut() // reused twice below; also cuts lineage
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
          .cut()
        // two components may pick the same edge — it joins them once
        val picked = sel.select("a", "b", "w").distinct()
        mst = if (mst == null) picked.cut()
              else mst.unionByName(picked).cut()
        // contract the picked-edge graph c → oc. It is FUNCTIONAL (the
        // groupBy gives every component exactly one out-pointer) and
        // under the (w, a, b) total order its only cycles are mutual
        // 2-cycles (following min-incident edges, weights are non-
        // increasing, so a longer cycle would need all-equal edges —
        // impossible under a total order). Pointer-doubling on that
        // pseudo-forest needs ONE equi-join per round and O(log depth)
        // rounds — far cheaper than the general star-contraction CC
        // (2 groupBys + distinct + fingerprint per round) this
        // replaces; the resulting partition of components is identical,
        // and the forest's edge set (the output) never depended on
        // which member id labels a merged component.
        val labels = contract(sel.select(col("c"), col("oc")))
        comp = comp
          .join(labels.select(col("id").as("comp"), col("component")),
            Seq("comp"), "left")
          .select(col("id"),
            coalesce(col("component"), col("comp")).as("comp"))
          .cut()
        iter += 1
      }
    }
    if (!done) throw new IllegalStateException(
      s"Boruvka did not converge within $maxIter rounds - component " +
        "halving guarantees O(log n); raise maxIter for graphs past " +
        "2^" + maxIter + " nodes")
    if (mst == null) e0.limit(0) else mst
  }

  /** Eagerly materialize `df` and RESET its plan-size statistic: the
    * checkpointed plan otherwise carries the origin plan's sizeInBytes
    * estimate forward (Spark 4 behavior), and [[contract]]'s self-join
    * SQUARES that estimate every doubling round — a few rounds in,
    * Catalyst planning grinds on BigIntegers with millions of digits
    * (measured: minutes of driver CPU inside stats estimation). The
    * re-wrap hands back the same materialized partitions under the
    * session-default size estimate; join-strategy choices still come
    * from AQE's runtime sizes. */
  private def checkpointFresh(df: DataFrame): DataFrame = {
    val cp = df.cut()
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** Connected components of the functional graph `c → oc` (exactly one
    * out-pointer per node, every `oc` also present as a `c`, all cycles
    * mutual 2-cycles — the Borůvka picked-edge shape) via pointer
    * doubling: break each 2-cycle at its smaller endpoint (that node
    * becomes the root, pointing at itself), then square the pointer
    * (`p ← p∘p`, one equi-join per round) until idempotent. Returns
    * (id, component) where component is the root's id — one label per
    * merged cluster; WHICH member id serves as the label is
    * deliberately unspecified (Borůvka only needs the partition). */
  private def contract(p0raw: DataFrame, maxIter: Int = 25): DataFrame = {
    val p0 = p0raw.select(col("c"), col("oc")).cut()
    var par = checkpointFresh(p0
      .join(p0.select(col("c").as("__p"), col("oc").as("__gp")),
        col("oc") === col("__p"))
      .select(col("c"),
        when(col("__gp") === col("c"), least(col("c"), col("oc")))
          .otherwise(col("oc")).as("p")))
    var stable = false
    var iter = 0
    while (!stable && iter < maxIter) {
      val j = checkpointFresh(par
        .join(par.select(col("c").as("__p"), col("p").as("__p2")),
          col("p") === col("__p"))
        .select(col("c"), col("p"), col("__p2")))
      stable = j.where(col("__p2") =!= col("p")).isEmpty
      par = j.select(col("c"), col("__p2").as("p"))
      iter += 1
    }
    if (!stable) throw new IllegalStateException(
      s"pointer-doubling contraction did not converge within $maxIter " +
        "rounds - doubling halves path length, so a pointer chain " +
        "exceeds 2^" + maxIter + " hops")
    par.select(col("c").as("id"), col("p").as("component"))
  }
}
