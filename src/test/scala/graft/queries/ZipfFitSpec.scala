package graft.queries

import graft.SparkTestBase

/** q229 Zipf power-law fit: planted 1/r spectrum lands on slope −1,
  * a flat spectrum on slope 0, and the fit is a pure function of the
  * token counts (rerun-identical). */
class ZipfFitSpec extends SparkTestBase {
  import spark.implicits._

  private def spectrum(counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(s"tok${"%03d".format(i)}")
    }.toDF("tok")

  test("q229: a planted 1/r spectrum fits slope ~ -1.0") {
    val got = TextVector.zipfFitOn(
      spectrum(Seq(1000, 500, 333, 250, 200, 167, 143, 125)), 8)
      .collect().head
    assert(got.getLong(0) == 8L)
    val slope = got.getLong(1)
    assert(slope > -1010000L && slope < -990000L, s"slope_micro $slope")
    // intercept ~ ln(1000) = 6.9078 in micro-nats
    val icpt = got.getLong(2)
    assert(icpt > 6880000L && icpt < 6930000L, s"intercept_micro $icpt")
  }

  test("q229: a flat spectrum fits slope 0 exactly") {
    val got = TextVector.zipfFitOn(spectrum(Seq.fill(6)(42)), 6)
      .collect().head
    assert(got.getLong(1) == 0L, s"$got")
    // intercept = ln(42) in micro-nats, exactly the snapped value
    assert(got.getLong(2) == math.round(math.log(42.0) * 1e6), s"$got")
  }

  test("q229: topN caps the spine and the fit is rerun-deterministic") {
    val df = spectrum(Seq(100, 50, 33, 25, 20, 17, 14, 12, 11, 10))
    val a = TextVector.zipfFitOn(df, 4).collect().head
    val b = TextVector.zipfFitOn(df, 4).collect().head
    assert(a.getLong(0) == 4L && a == b)
  }
}
