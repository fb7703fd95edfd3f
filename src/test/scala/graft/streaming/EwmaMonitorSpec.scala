package graft.streaming

import graft.queries.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class EwmaMonitorSpec extends graft.SparkTestBase {
  import spark.implicits._
  import EwmaMonitor._

  private val dir = "/root/testdata/sf0.001"

  test("date-ordered stream reproduces the batch q141 bit-for-bit") {
    val batch = Analytics.q141Ewma(spark, dir)
      .orderBy("region", "date")
      .as[(String, String, Long, Long)].collect().toSeq
    val daily = batch.map { case (r, d, n, _) => DayCount(r, d, n) }
    // chunk BY DATE across all regions — the closed-day arrival shape
    val dates = daily.map(_.date).distinct.sorted
    val chunks = dates.grouped(math.max(1, dates.size / 3)).toSeq
      .map(ds => daily.filter(d => ds.contains(d.date)))

    val input = MemoryStream[DayCount](spark)
    val q = monitor(input.toDS()).writeStream
      .format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Update).start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val streamed = spark.table("ewma_out")
      .as[EwmaRow].collect()
      .map(r => (r.region, r.date, r.n, r.ewma_micro)).sorted.toSeq
    assert(streamed == batch.sorted,
      "streamed EWMA diverged from the batch fold")
  }

  test("a day at or before the state's frontier fails loudly") {
    val input = MemoryStream[DayCount](spark)
    val q = monitor(input.toDS()).writeStream
      .format("memory").queryName("ewma_bad")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(Seq(DayCount("R0", "2024-01-02", 5L)))
      q.processAllAvailable()
      input.addData(Seq(DayCount("R0", "2024-01-01", 3L)))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("non-monotone") ||
        Option(ex.getCause).exists(_.getMessage.contains("non-monotone")))
    } finally q.stop()
  }
}
