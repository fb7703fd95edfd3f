package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating Large-Star /
  * Small-Star (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC 2014 — public algorithm, re-derived here on DataFrames).
  *
  * Why not plain min-label propagation: its round count is the graph
  * DIAMETER (a 10M-node chain needs 10M rounds); star-contraction
  * converges in O(log n) rounds and provably never grows the edge set
  * beyond O(n + m). That difference is what makes component-finding
  * (dup-cluster grouping, user stitching) tractable at 100 TB.
  *
  * Per round both operators are one groupBy + one join — all shuffles on
  * the node id. Lineage is cut each round (`localCheckpoint`): iterative
  * DataFrame algorithms otherwise build exponentially deep plans.
  *
  * Output: (id, component) for every node, component = min id reachable.
  */
object ConnectedComponents {

  /** Neighbors-with-min view: for each node u of the symmetrized graph,
    * its neighbor list annotated with m = min(N(u) ∪ {u}). */
  private def withMin(sym: DataFrame): DataFrame =
    sym.groupBy(col("u"))
      .agg(collect_set(col("v")).as("nbrs"))
      .select(col("u"), col("nbrs"),
        least(array_min(col("nbrs")), col("u")).as("m"))

  /** Large-Star: strictly larger neighbors of u attach to u's min. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
    withMin(sym)
      .select(col("m"), explode(filter(col("nbrs"), n => n > col("u"))).as("v"))
      .where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
    // no distinct here: the next operator is smallStar's groupBy, whose
    // map-side collect_set dedups anyway — a distinct would be one extra
    // full shuffle per round
  }

  /** Small-Star: u and its ≤ neighbors all attach to u's min. */
  private def smallStar(edges: DataFrame): DataFrame = {
    // canonicalize so each edge points large → small exactly once
    val canon = edges.select(
      greatest(col("src"), col("dst")).as("u"), least(col("src"), col("dst")).as("v"))
    withMin(canon)
      .select(col("u"), col("m"),
        explode(array_union(filter(col("nbrs"), n => n <= col("u")), array(col("u"))))
          .as("v"))
      .where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Components of the graph given by `edges` (two numeric id columns
    * `src`, `dst`). Nodes absent from `edges` are their own component —
    * pass `allNodes` to include them in the output.
    *
    * If the contraction has not reached a fixpoint within `maxIter`
    * rounds the labels may be WRONG (split components) — by default that
    * throws rather than letting a non-fixpoint edge set masquerade as a
    * result; `failOnMaxIter = false` downgrades to a stderr warning for
    * callers that prefer a best-effort answer. */
  def components(edges: DataFrame, allNodes: Option[DataFrame] = None,
      maxIter: Int = 25, failOnMaxIter: Boolean = true): DataFrame = {
    var e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().localCheckpoint(true)
    // set fingerprint = (cardinality, commutative sum of per-edge hashes):
    // equal fingerprints ⇒ equal distinct edge sets up to a ~2^-64 hash-sum
    // collision (maxIter backstops). ONE cheap aggregation job per round —
    // an exceptAll diff would be a full extra shuffle per round
    // decimal(38,0) accumulator: a Long sum of 2^63-scale hashes overflows
    // (ANSI arithmetic throws); decimal 38 digits holds 10^19 edges' worth
    def fingerprint(df: DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).head()
      (r.getLong(0), String.valueOf(r.getDecimal(1)))
    }
    var converged = false
    var iter = 0
    var eFp = fingerprint(e)
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextFp = fingerprint(next)
      converged = nextFp == eFp
      e = next
      eFp = nextFp
      iter += 1
    }
    if (!converged) {
      val msg = s"ConnectedComponents did not converge within $maxIter " +
        "rounds — labels may split components; raise maxIter " +
        "(O(log n) rounds suffice for star contraction)"
      if (failOnMaxIter) throw new IllegalStateException(msg)
      else System.err.println(s"WARN $msg")
    }
    // at fixpoint every edge points node → component min
    val labeled = e.select(col("src").as("id"), col("dst").as("component"))
      .unionByName(e.select(col("dst").as("id"), col("dst").as("component")))
      .groupBy("id").agg(min("component").as("component"))
    allNodes match {
      case Some(nodes) =>
        val ids = nodes.select(col(nodes.columns.head).as("id")).distinct()
        ids.join(labeled, Seq("id"), "left")
          .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      case None => labeled
    }
  }
}
