package graft.sources

import graft.SparkTestBase
import graft.streaming.Ingest

/** The producer contract round-trips: window-normalization destroys the
  * scale, Q-stitching recovers the series shape exactly (up to one global
  * factor), and the emitted JSON drives the real ingest path. */
class SyntheticProducerSpec extends SparkTestBase {

  test("q-stitch recovers the original series up to one global scale factor") {
    val s = SyntheticProducer.series("Influenza", "US", 1 to 200)
    val stitched = SyntheticProducer.qStitch(
      SyntheticProducer.windowed(s, windowLen = 60, overlap = 15))
    assert(stitched.map(_._1) == s.map(_._1), "days must survive stitching")
    val ratios = stitched.zip(s).map { case ((_, a), (_, b)) => a / b }
    val mean = ratios.sum / ratios.size
    // Trends-style per-window max-normalization is EXACTLY multiplicative,
    // so Q-stitching is exact up to fp noise — tight tolerance on purpose
    assert(ratios.forall(r => math.abs(r / mean - 1.0) < 1e-9),
      s"shape distorted: spread=${ratios.max - ratios.min}")
  }

  test("q factor is robust to zero/overlap-edge values") {
    val a = Seq((1, 10.0), (2, 0.0), (3, 30.0))
    val b = Seq((2, 5.0), (3, 15.0), (4, 20.0))
    // day 2 excluded (zero on one side): q = 30/15 = 2
    assert(SyntheticProducer.qFactor(a, b) == 2.0)
  }

  test("emitted JSON lines drive the real parse -> daily aggregation path") {
    import spark.implicits._
    val lines = SyntheticProducer.eventLines("Sore throat", "US",
      SyntheticProducer.series("Sore throat", "US", 1 to 10))
    val parsed = Ingest.parseJson(lines.toDF("json"))
    assert(parsed.columns.toSeq == Seq("datetime", "kw", "region", "value"))
    assert(parsed.where($"datetime".isNull).count() == 0, "unparseable lines")
    val daily = parsed
      .groupBy($"kw", to_date($"datetime").as("d"))
      .agg(round(sum($"value"), 4).as("v"))
      .as[(String, java.sql.Date, Double)].collect()
    assert(daily.length == 10)
    val expected = SyntheticProducer.series("Sore throat", "US", 1 to 10).toMap
    daily.foreach { case (kw, d, v) =>
      assert(kw == "Sore throat")
      val day = d.toLocalDate.getDayOfYear
      assert(math.abs(v - expected(day)) < 1e-3, s"day $day: $v vs ${expected(day)}")
    }
  }

  private def to_date(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.to_date(c)
  private def round(c: org.apache.spark.sql.Column, n: Int) =
    org.apache.spark.sql.functions.round(c, n)
  private def sum(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.sum(c)
}
