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

  /** Driver-side mirror of the PERSONALIZED integer recurrence (point
    * teleport at the seed) — independent code path. */
  private def simulatePpr(edges: Seq[(String, String, Long)], seed: String,
      iters: Int, d: Int = 85, scale: Long = 1000000000L): Map[String, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(v => v -> (if (v == seed) scale else 0L)).toMap
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(outW.contains).map(r).sum
      val contrib = edges
        .map { case (s, t, w) => t -> (r(s) * d * w) / (100 * outW(s)) }
        .groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).sum }
      r = nodes.map(v => v ->
        ((if (v == seed) ((100L - d) * scale) / 100 + (d * dangling) / 100
          else 0L) + contrib.getOrElse(v, 0L))).toMap
    }
    r
  }

  test("personalized: matches the driver-side integer simulation exactly") {
    val rnd = new scala.util.Random(23L)
    val nodes = ('a' to 'h').map(_.toString)
    val edges = (for {
      s <- nodes.take(6) // g, h dangle
      t <- nodes if t != s && rnd.nextDouble() < 0.4
    } yield (s, t, 1L + rnd.nextInt(5).toLong)).toSeq
    val got = PageRank.personalizedRanks(edges.toDF("src", "dst", "w"), "a",
      iterations = 6).as[(String, Long)].collect().toMap
    assert(got == simulatePpr(edges, "a", 6))
  }

  test("personalized: seed dominates, weight splits flow, unreachable stays zero") {
    // a holds half its outflow (self-loop breaks the finite-round
    // oscillation parity) and splits the rest 3:1 between b and c, who
    // return to a; d -> e is unreachable
    val edges = Seq(("a", "a", 4L), ("a", "b", 3L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L), ("d", "e", 1L))
    val got = PageRank.personalizedRanks(edges.toDF("src", "dst", "w"), "a",
      iterations = 5).as[(String, Long)].collect().toMap
    assert(got("a") > got("b"), s"seed must hold the most mass: $got")
    assert(got("b") > got("c"),
      s"3x edge weight must carry 3x restart mass: $got")
    assert(got("d") == 0L && got("e") == 0L, s"unreachable leaked mass: $got")
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
