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
}
