package graft.streaming

import java.nio.file.Files
import java.sql.Date

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import OnlineAnomaly.{Alert, DailyRecord, SeriesState}

class OnlineAnomalySpec extends SparkTestBase {
  import spark.implicits._

  private def day(i: Int) =
    Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i - 1))

  test("spike after calm history alerts; state persists across batches") {
    val input = MemoryStream[DailyRecord](spark)
    val alerts = OnlineAnomaly.alerts(input.toDS(), zThreshold = 3.0, minHistory = 7)
    val name = s"alerts_${System.nanoTime()}"
    val q = alerts.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("oa").toString)
      .start()
    try {
      // batch 1: 10 calm days (values 10 ± 1) across two series
      input.addData((1 to 10).flatMap(i => Seq(
        DailyRecord(day(i), "US", "Cough", 10.0 + (i % 3)),
        DailyRecord(day(i), "IL", "Cough", 20.0 + (i % 3)))))
      q.processAllAvailable()
      // batch 2: US spikes; IL stays calm
      input.addData(Seq(
        DailyRecord(day(11), "US", "Cough", 50.0),
        DailyRecord(day(11), "IL", "Cough", 21.0)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).as[Alert].collect()
    assert(out.length == 1, out.mkString(","))
    assert(out.head.region == "US")
    assert(out.head.date == day(11))
    assert(out.head.zscore > 3.0)
    assert(out.head.n_history == 10) // state carried across micro-batches
  }

  test("warm-up period never alerts (minHistory guard)") {
    val input = MemoryStream[DailyRecord](spark)
    val alerts = OnlineAnomaly.alerts(input.toDS(), zThreshold = 1.0, minHistory = 7)
    val name = s"warm_${System.nanoTime()}"
    val q = alerts.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("oa2").toString)
      .start()
    try {
      input.addData((1 to 5).map(i =>
        DailyRecord(day(i), "US", "Fever", if (i == 5) 999.0 else 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table(name).isEmpty)
  }

  test("Welford update matches two-pass mean/variance") {
    val xs = Seq(3.0, 7.0, 7.0, 19.0, 2.0, 11.0)
    val s = xs.foldLeft(SeriesState(0, 0.0, 0.0))(OnlineAnomaly.update)
    val mean = xs.sum / xs.size
    val m2 = xs.map(x => (x - mean) * (x - mean)).sum
    assert(s.n == xs.size)
    assert(math.abs(s.mean - mean) < 1e-12)
    assert(math.abs(s.m2 - m2) < 1e-9)
  }
}
