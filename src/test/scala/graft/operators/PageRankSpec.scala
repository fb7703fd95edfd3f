package graft.operators

import org.apache.spark.sql.functions._

class PageRankSpec extends graft.SparkTestBase {
  import spark.implicits._

  /** Driver-side mirror of the exact integer recurrence — independent
    * code path (plain Maps), must agree with the operator bit-for-bit. */
  private def simulate(edges: Seq[(String, String, Long)], iters: Int,
      extraNodes: Seq[String] = Nil, d: Int = 85,
      scale: Long = 1000000000L): Map[String, Long] = {
    val nodes = (edges.flatMap(e => Seq(e._1, e._2)) ++ extraNodes).distinct
    val n = nodes.size.toLong
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(outW.contains).map(r).sum
      val contrib = edges
        .map { case (s, t, w) => t -> (r(s) * d * w) / (100 * outW(s)) }
        .groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).sum }
      r = nodes.map(v => v ->
        (((100L - d) * scale) / (100 * n) +
          contrib.getOrElse(v, 0L) + (d * dangling) / (100 * n))).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int,
      allNodes: Option[Seq[String]] = None): Map[String, Long] = {
    val e = edges.toDF("src", "dst", "w")
    val extra = allNodes.map(ns => ns.toDF("node"))
    PageRank.ranks(e, iterations = iters, allNodes = extra)
      .as[(String, Long)].collect().toMap
  }

  test("two-node cycle is symmetric and conserves mass") {
    val got = run(Seq(("a", "b", 1L), ("b", "a", 1L)), iters = 8)
    assert(got("a") == got("b"))
    // integer truncation loses at most a few units per node per round
    assert(math.abs(got.values.sum - 1000000000L) < 100L)
  }

  test("matches the driver-side integer simulation exactly (weighted, with dangling)") {
    val rnd = new scala.util.Random(11L)
    val nodes = ('a' to 'j').map(_.toString)
    val edges = (for {
      s <- nodes.take(8) // i, j dangle: no out-edges
      t <- nodes if t != s && rnd.nextDouble() < 0.35
    } yield (s, t, 1L + rnd.nextInt(9).toLong)).toSeq
    val got = run(edges, iters = 6, allNodes = Some(nodes))
    val want = simulate(edges, iters = 6, extraNodes = nodes)
    assert(got == want)
  }

  test("hub of an in-star outranks the spokes; isolated node keeps teleport share") {
    val spokes = Seq("s1", "s2", "s3", "s4")
    val edges = spokes.map(s => (s, "hub", 1L)) ++ Seq(("hub", "s1", 1L))
    val got = run(edges, iters = 5, allNodes = Some(spokes ++ Seq("hub", "iso")))
    assert(got("hub") > got("s1") && got("s1") > got("s2") * 9 / 10,
      s"hub must dominate: $got")
    assert(spokes.tail.forall(s => got(s) == got("s2")))
    // the isolated node still receives teleport + dangling shares
    assert(got("iso") > 0L)
    assert(got == simulate(edges, 5, extraNodes = Seq("iso")))
  }
}
