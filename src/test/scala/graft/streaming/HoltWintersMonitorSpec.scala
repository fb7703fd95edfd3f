package graft.streaming

import graft.queries.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class HoltWintersMonitorSpec extends graft.SparkTestBase {
  import spark.implicits._
  import HoltWintersMonitor._

  private val dir = "/root/testdata/sf0.001"

  /** The batch query's densified daily series, rebuilt identically. */
  private def denseDaily(): Seq[DayCount] = {
    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"),
        concat(lit("R"), (col("user_id") % 5).cast("string")).as("region"))
      .agg(count(lit(1)).as("n"))
    val days = daily.select("d").distinct()
    daily.select("region").distinct().crossJoin(days)
      .join(daily, Seq("region", "d"), "left")
      .select(col("region"), date_format(col("d"), "yyyy-MM-dd").as("date"),
        coalesce(col("n"), lit(0L)).as("n"))
      .as[DayCount].collect().toSeq
  }

  test("densified date-ordered stream reproduces the batch q181 bit-for-bit") {
    val batch = Analytics.q181HoltWinters(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(batch.nonEmpty)
    val daily = denseDaily()
    val dates = daily.map(_.date).distinct.sorted
    val chunks = dates.grouped(math.max(1, dates.size / 4)).toSeq
      .map(ds => daily.filter(d => ds.contains(d.date)))

    val input = MemoryStream[DayCount](spark)
    val q = monitor(input.toDS()).writeStream
      .format("memory").queryName("hw_out")
      .outputMode(OutputMode.Update).start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val streamed = spark.table("hw_out").as[HwRow].collect()
      .map(r => (r.region, r.date, r.n, r.level_micro, r.trend_micro,
        r.seasonal_micro, r.forecast_micro)).sorted.toSeq
    assert(streamed == batch.sorted,
      "streamed Holt-Winters diverged from the batch fold")
  }

  test("a skipped day fails loudly — the seasonal lag is positional") {
    val input = MemoryStream[DayCount](spark)
    val q = monitor(input.toDS()).writeStream
      .format("memory").queryName("hw_bad")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(Seq(DayCount("R0", "2024-01-01", 5L)))
      q.processAllAvailable()
      input.addData(Seq(DayCount("R0", "2024-01-03", 3L))) // gap: Jan 2 missing
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def hasMsg(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains("not consecutive")) ||
          hasMsg(t.getCause))
      assert(hasMsg(ex))
    } finally q.stop()
  }
}
