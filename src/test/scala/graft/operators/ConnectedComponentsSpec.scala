package graft.operators

import graft.SparkTestBase

/** Correctness of star-contraction components against an in-test BFS
  * ground truth on seeded random graphs, plus adversarial shapes (long
  * chain = worst case for plain label propagation; ring; singletons). */
class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def truth(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, List[Long]]()
      .withDefaultValue(Nil)
    edges.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
    val comp = scala.collection.mutable.Map[Long, Long]()
    for (start <- 0L until n if !comp.contains(start)) {
      var frontier = List(start)
      val seen = scala.collection.mutable.Set(start)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj).filterNot(seen)
        seen ++= frontier
      }
      val m = seen.min
      seen.foreach(x => comp(x) = m)
    }
    comp.toMap
  }

  private def run(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.toDF("src", "dst")
    val nodes = spark.range(n).toDF("id")
    ConnectedComponents.components(e, Some(nodes))
      .as[(Long, Long)].collect().toMap
  }

  test("chain, ring, and singletons resolve to min-id components") {
    val chain = (0L until 29L).map(i => (i, i + 1))          // one long path
    val ring = (30L until 39L).map(i => (i, i + 1)) :+ ((39L, 30L))
    val edges = chain ++ ring                                // 40..44 isolated
    val got = run(45L, edges)
    assert((0L to 29L).forall(got(_) == 0L))
    assert((30L to 39L).forall(got(_) == 30L))
    assert((40L to 44L).forall(i => got(i) == i))
  }

  test("hitting maxIter without a fixpoint fails loudly (or warns when opted out)") {
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalStateException] {
      ConnectedComponents.components(chain, maxIter = 1).collect()
    }
    // best-effort mode still returns labels for every node
    val loose = ConnectedComponents.components(chain,
      Some(spark.range(30L).toDF("id")), maxIter = 1,
      failOnMaxIter = false).as[(Long, Long)].collect().toMap
    assert(loose.keySet == (0L until 30L).toSet)
  }

  test("seeded random graphs match BFS ground truth") {
    val rnd = new scala.util.Random(5L)
    val n = 200L
    val edges = Seq.fill(150)((rnd.nextLong(n).abs, rnd.nextLong(n).abs))
      .filter { case (a, b) => a != b }
    assert(run(n, edges) == truth(n, edges))
  }

  // adversarial shapes for the min-view star operators (r13: collect_set
  // adjacency arrays → map-side-combinable min + join)

  test("hot-hub star: one node adjacent to everything") {
    // the skew case the min-view formulation exists for — a single key
    // owning every edge; also exercises hub-as-src AND hub-as-dst
    val spokesOut = (1L to 60L).map(i => (0L, i))
    val spokesIn = (61L to 120L).map(i => (i, 0L))
    val edges = spokesOut ++ spokesIn
    val got = run(121L, edges)
    assert((0L to 120L).forall(got(_) == 0L))
    // hub is NOT the min: star centered on a large id
    val big = (0L until 50L).map(i => (200L, i)) // 200 adjacent to 0..49
    val got2 = run(201L, big)
    assert(got2(200L) == 0L && (0L until 50L).forall(got2(_) == 0L))
  }

  test("duplicate and bidirectional input edges change nothing") {
    val base = Seq((1L, 2L), (2L, 3L), (5L, 6L))
    val noisy = base ++ base.map(_.swap) ++ base ++ Seq((2L, 1L), (3L, 2L))
    assert(run(7L, noisy) == run(7L, base))
  }

  test("star rounds plan as map-side-combinable min aggregations, never arrays") {
    // the r13 rewrite's plan contract (guide §2.3/§2.5): a star round
    // must never build per-key neighbor arrays (collect_set → the
    // hot-hub OOM) — its only aggregations are plain min() HashAggregates
    // with a partial (map-side) phase before the exchange
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 2L)).toDF("src", "dst")
    val round = ConnectedComponents.smallStar(ConnectedComponents.largeStar(edges))
    val plan = round.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_set"), s"adjacency array in round plan:\n$plan")
    assert(!plan.contains("ObjectHashAggregate"),
      s"non-codegen aggregate in round plan:\n$plan")
    assert(plan.contains("partial_min"),
      s"expected a map-side partial min aggregation:\n$plan")
  }

  test("two cliques joined by a bridge resolve in few rounds") {
    val cliqueA = for (a <- 0L until 8L; b <- (a + 1) until 8L) yield (a, b)
    val cliqueB = for (a <- 10L until 18L; b <- (a + 1) until 18L) yield (a, b)
    val edges = cliqueA ++ cliqueB ++ Seq((7L, 10L))
    val got = run(18L, edges)
    // 8 and 9 touch no edge: they stay their own singleton components
    assert(((0L until 8L) ++ (10L until 18L)).forall(got(_) == 0L))
    assert(got(8L) == 8L && got(9L) == 9L)
  }
}
