package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** q201 HyperANF: exact agreement with a driver-side FM replica on a
  * planted path, fixpoint on a clique, monotone growth. The sketch is
  * deterministic (md5 registers), so the tests are exact equalities,
  * not statistical bounds. */
class AnfSpec extends SparkTestBase {
  import spark.implicits._

  private def knnFrame(edges: Seq[(Long, Long)]): DataFrame =
    edges.map { case (a, b) => (a, b, 1, 1.0) }
      .toDF("vec_id", "neighbor_id", "rank", "sim")

  /** The engine's register draw, replicated: 2^(lowest set bit) of the
    * first-8-hex-chars md5 of "anf:j:id". */
  private def fmMask(j: Int, id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"anf:$j:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val u = java.lang.Long.parseLong(hex, 16)
    val rho = if (u == 0L) 31 else java.lang.Long.numberOfTrailingZeros(u)
    1L << rho
  }

  private def lowestUnset(m: Long): Int =
    (0 until 32).find(b => (m >> b & 1L) == 0L).getOrElse(32)

  /** Driver-side exact ANF over an undirected adjacency map. */
  private def replica(adj: Map[Long, Set[Long]], rounds: Int): Seq[(Int, Long, Long)] = {
    var masks: Map[Long, Seq[Long]] = adj.keys.map(v =>
      v -> (0 until GraphEval.AnfCopies).map(j => fmMask(j, v))).toMap
    (1 to rounds).map { r =>
      masks = masks.map { case (v, ms) =>
        v -> (adj(v) + v).toSeq.map(masks)
          .foldLeft(Seq.fill(GraphEval.AnfCopies)(0L)) { (acc, other) =>
            acc.zip(other).map { case (x, y) => x | y }
          }
      }
      val rsum = masks.values.map(_.map(m => lowestUnset(m).toLong).sum).sum
      (r, adj.size.toLong, rsum)
    }
  }

  test("q201 matches the driver replica exactly on a planted path") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val adj = (1L to 5L).map { v =>
      v -> edges.collect {
        case (a, b) if a == v => b
        case (a, b) if b == v => a
      }.toSet
    }.toMap
    val got = GraphEval.anfOn(knnFrame(edges), GraphEval.AnfRounds)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == replica(adj, GraphEval.AnfRounds).toSet)
  }

  test("q201 on a clique reaches its fixpoint after round 1") {
    val edges = for { a <- 1L to 6L; b <- (a + 1) to 6L } yield (a, b)
    val rows = GraphEval.anfOn(knnFrame(edges), GraphEval.AnfRounds)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // one hop reaches everyone; further rounds must not change r_sum
    assert(rows(1) == rows(2) && rows(2) == rows(3) && rows(3) == rows(4))
  }

  test("q201 r_sum grows monotonically with the radius") {
    val dir = "/root/testdata/sf0.001"
    val rows = GraphEval.q201Hyperanf(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(rows.keySet == (1 to GraphEval.AnfRounds).toSet)
    for (r <- 2 to GraphEval.AnfRounds)
      assert(rows(r) >= rows(r - 1), s"r_sum shrank at round $r")
  }
}
