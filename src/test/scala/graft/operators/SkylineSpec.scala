package graft.operators

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

class SkylineSpec extends graft.SparkTestBase {
  import spark.implicits._

  /** Brute-force dominance reference: minimize x, maximize y. */
  private def bruteFrontier(pts: Seq[(Long, Double, Int)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.map(_._1).toSet

  test("matches brute-force dominance on randomized point sets") {
    val rnd = new scala.util.Random(136L)
    for (trial <- 1 to 15) {
      val n = 1 + rnd.nextInt(300)
      // small value domains force x-ties, y-ties, and exact duplicates
      val pts = (0 until n).map(i =>
        (i.toLong, (rnd.nextInt(20) * 5).toDouble / 10, rnd.nextInt(15)))
      val got = Skyline.frontier2D(pts.toDF("id", "x", "y"), "x", "y")
        .select("id").as[Long].collect().toSet
      assert(got == bruteFrontier(pts), s"trial $trial: $pts")
    }
  }

  test("duplicate frontier points are both kept; same-x smaller-y is dominated") {
    val pts = Seq(
      (1L, 1.0, 10), (2L, 1.0, 10), // exact duplicates — neither dominates
      (3L, 1.0, 9),                 // same x, smaller y → dominated by 1/2
      (4L, 2.0, 11),                // pricier but larger → frontier
      (5L, 2.0, 10),                // dominated by 1 (cheaper, same y)
      (6L, 0.5, 1)                  // cheapest of all → frontier
    ).toDF("id", "x", "y")
    val got = Skyline.frontier2D(pts, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L, 6L))
  }

  test("null coordinates are excluded, not frontier members") {
    val pts = Seq[(Long, java.lang.Double, java.lang.Integer)](
      (1L, 1.0, 5), (2L, null, 99), (3L, 0.1, null))
      .toDF("id", "x", "y")
    val got = Skyline.frontier2D(pts, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("plan has no unpartitioned window (the scale guard)") {
    val pts = (1 to 1000).map(i => (i.toLong, (i % 97).toDouble, i % 31))
      .toDF("id", "x", "y")
    val plan = Skyline.frontier2D(pts, "x", "y").queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the bucketed window to survive planning")
    windows.foreach(w =>
      assert(w.partitionSpec.nonEmpty, "global (single-partition) window in skyline plan"))
  }
}
