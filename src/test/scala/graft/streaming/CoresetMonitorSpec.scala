package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class CoresetMonitorSpec extends graft.SparkTestBase {
  import spark.implicits._
  import CoresetMonitor._

  // 4 well-separated planted clusters in 2D, 12 points each; jitter is
  // deterministic (id-derived), diameter ~0.1 vs separation 10
  private val clusterAt = Map(0 -> (0.0, 0.0), 1 -> (10.0, 0.0),
    2 -> (0.0, 10.0), 3 -> (10.0, 10.0))
  private def planted(group: String): Seq[Pt] =
    (0 until 48).map { i =>
      val (cx, cy) = clusterAt(i % 4)
      val j = (i * 2654435761L % 100) / 1000.0 - 0.05
      Pt(group, i.toLong, Array(cx + j, cy - j))
    }
  private def clusterOf(id: Long): Int = (id % 4).toInt

  private def dist(a: Array[Double], b: Array[Double]): Double =
    math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)

  /** Last emitted snapshot per group from the memory sink. */
  private def finalRows(table: String): Map[String, CoresetRow] =
    spark.table(table).as[CoresetRow].collect()
      .groupBy(_.group).map { case (g, rs) => g -> rs.maxBy(_.n_seen) }

  private def run(chunks: Seq[Seq[Pt]], k: Int, name: String): Map[String, CoresetRow] = {
    val input = MemoryStream[Pt](spark)
    val q = monitor(input.toDS(), k).writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    finally q.stop()
    finalRows(name)
  }

  test("planted clusters: k centers land one per cluster, coverage within 2r") {
    val pts = planted("g")
    val out = run(pts.grouped(17).toSeq, k = 4, "coreset_a")("g")
    assert(out.n_seen == 48L)
    assert(out.n_centers == 4)
    assert(out.center_ids.map(clusterOf).distinct.size == 4,
      s"centers ${out.center_ids} collapse onto a shared cluster")
    // the doubling invariant: every point ever seen within 2r of a center
    val r = out.radius_micro / 1e6
    assert(r < 1.0, s"radius $r blew past the cluster scale")
    val centers = pts.filter(p => out.center_ids.contains(p.id)).map(_.vec)
    pts.foreach { p =>
      val d = centers.map(dist(_, p.vec)).min
      assert(d <= 2 * r + 1e-5, s"point ${p.id} at $d exceeds 2r=${2 * r}")
    }
  }

  test("coverage invariant holds under a different batch split and groups stay isolated") {
    val a = planted("ga")
    // group gb sees only 2 clusters — its state must not bleed from ga
    val b = planted("gb").filter(p => clusterOf(p.id) < 2)
    val mixed = (a ++ b).sortBy(_.id)
    val out = run(mixed.grouped(7).toSeq, k = 4, "coreset_b")
    val ra = out("ga"); val rb = out("gb")
    assert(ra.n_seen == 48L && rb.n_seen == 24L)
    assert(ra.n_centers <= 4 && rb.n_centers <= 4)
    assert(rb.center_ids.map(clusterOf).forall(_ < 2),
      "gb grew a center from a cluster it never saw")
    for ((g, row, pts) <- Seq(("ga", ra, a), ("gb", rb, b))) {
      val r = row.radius_micro / 1e6
      val centers = pts.filter(p => row.center_ids.contains(p.id)).map(_.vec)
      pts.foreach { p =>
        val d = centers.map(dist(_, p.vec)).min
        assert(d <= 2 * r + 1e-5, s"[$g] point ${p.id} at $d exceeds 2r=${2 * r}")
      }
    }
  }
}
