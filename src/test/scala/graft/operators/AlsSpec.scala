package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q232 ALS: the 4×4 solver against hand-checked systems, recovery of
  * an exactly-low-rank planted matrix (error curve collapses), weak
  * monotonicity of the curve, and cross-run determinism. */
class AlsSpec extends SparkTestBase {
  import spark.implicits._

  test("solve: hand-checked 2x2 and pivoting 3x3 systems") {
    // [2 1; 1 3] x = [5; 10] -> x = (1, 3)
    val x2 = Als.solve(Array(Array(2.0, 1.0), Array(1.0, 3.0)),
      Array(5.0, 10.0))
    assert(math.abs(x2(0) - 1.0) < 1e-12 && math.abs(x2(1) - 3.0) < 1e-12)
    // needs a pivot swap: leading zero
    val x3 = Als.solve(
      Array(Array(0.0, 1.0, 1.0), Array(2.0, 0.0, 1.0), Array(1.0, 1.0, 0.0)),
      Array(5.0, 5.0, 3.0))
    // solution of {y+z=5, 2x+z=5, x+y=3}: x=1, y=2, z=3
    assert(x3.zip(Array(1.0, 2.0, 3.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 })
  }

  /** Exactly rank-2 ratings: r(u,i) = pu · qi with planted factors. */
  private def planted() = {
    val p = (1 to 8).map(u => u.toLong -> Array(1.0 + u % 3, 0.5 * (u % 4)))
    val q = (1 to 6).map(i => i.toLong -> Array(0.5 + i % 2, 1.0 + i % 3))
    for ((u, pu) <- p; (i, qi) <- q)
      yield (u, i, pu(0) * qi(0) + pu(1) * qi(1))
  }

  test("q232: ALS collapses the error on an exactly-rank-2 matrix") {
    val ratings = planted().toDF("key", "other", "r")
    val curve = Als.errorCurve(spark, ratings, k = 2, iters = 4,
      lambda = 1e-4)
      .orderBy("iter").collect()
    assert(curve.length == 5)
    val rmse = curve.map(_.getLong(3))
    // init error is O(1) rmse; the fit must reach ~0 (sub-2% in milli)
    assert(rmse.head > 200L, s"init curve too easy: ${rmse.toList}")
    assert(rmse.last < 20L, s"did not collapse: ${rmse.toList}")
    // weakly decreasing (tiny quantization jitter tolerated)
    rmse.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1, s"curve rose: ${rmse.toList}") }
  }

  test("q232: the whole curve is a pure function of the ratings") {
    val ratings = planted().toDF("key", "other", "r")
    def run() = Als.errorCurve(spark, ratings, 2, 2, 0.01)
      .orderBy("iter").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(run() == run())
  }

  test("q232: corpus error curve is finite and sized per iteration") {
    val out = graft.queries.Recommend
      .q232AlsFactorize(spark, "/root/testdata/sf0.001")
      .orderBy("iter").collect()
    assert(out.length == graft.queries.Recommend.AlsIters + 1)
    assert(out.forall(r => r.getLong(2) >= 0L && r.getLong(3) >= 0L))
    // training error after 3 alternations beats the random init
    assert(out.last.getLong(3) < out.head.getLong(3))
  }
}
