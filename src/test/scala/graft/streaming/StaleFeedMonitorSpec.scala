package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Event-time-timer dead-feed detection: a key whose silence the
  * watermark certifies must alert exactly once with its last-seen
  * time; a key that keeps reporting must never alert; a key that
  * resumes before its deadline re-arms silently. */
class StaleFeedMonitorSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private val T0 = 1700000000000L // fixed epoch anchor, ms
  private val Minute = 60000L

  /** (type, minutesAfterT0) rows through a 0-delay watermark into the
    * monitor with a 10-minute staleness deadline. */
  private def run(chunks: Seq[Seq[(String, Long)]]): Seq[StaleAlert] =
    withRocksDb {
      val input = MemoryStream[(String, Long)](spark)
      val withWm = input.toDS()
        .select(col("_1").as("t"),
          timestamp_millis(col("_2") * Minute + T0).as("ts"))
        .withWatermark("ts", "0 seconds")
        .select(col("t"), unix_millis(col("ts")).as("ms"))
        .as[(String, Long)]
      val q = StaleFeedMonitor.alerts(withWm, staleAfterMs = 10 * Minute)
        .writeStream.format("memory").queryName("stale_alerts")
        .outputMode(OutputMode.Append).start()
      try {
        chunks.foreach { c => input.addData(c); q.processAllAvailable() }
        // one extra empty-ish tick is NOT needed: timers fire on the
        // micro-batch whose watermark passes the deadline
        spark.table("stale_alerts").as[StaleAlert].collect().toSeq
      } finally q.stop()
    }

  test("a silent key alerts once when the watermark passes its deadline") {
    // a and b both report at minute 0; only a keeps reporting. The
    // minute-20 batch moves the watermark past b's minute-10 deadline.
    val alerts = run(Seq(
      Seq(("a", 0L), ("b", 0L)),
      Seq(("a", 5L)),
      Seq(("a", 20L)),
      Seq(("a", 21L))))
    val byKey = alerts.groupBy(_.event_type)
    assert(!byKey.contains("a"), s"live feed alerted: $alerts")
    assert(byKey("b").map(a => (a.last_seen_ms, a.deadline_ms)) ===
      Seq((T0, T0 + 10 * Minute)))
  }

  test("a key that resumes before its deadline never alerts") {
    val alerts = run(Seq(
      Seq(("a", 0L), ("b", 0L)),
      Seq(("b", 8L), ("a", 9L)),   // b resumes inside the 10-min window
      Seq(("a", 30L), ("b", 25L))))
    assert(!alerts.exists(_.event_type == "b"),
      s"resumed feed alerted: $alerts")
  }

  test("out-of-order rows re-arm against the MAX event time") {
    // b's minute-7 row arrives after its minute-9 row: the deadline
    // must stay anchored at minute 9 (max), so the minute-18 watermark
    // (past 7+10=17, before 9+10=19) must NOT alert yet
    val a1 = run(Seq(
      Seq(("b", 9L)), Seq(("b", 7L)),
      Seq(("pace", 18L))))
    assert(!a1.exists(_.event_type == "b"), s"early alert: $a1")
    // watermark lags one batch (batch N runs under batch N-1's max),
    // so a final pacing batch is needed for wm ≥ 19 to take effect
    val a2 = run(Seq(
      Seq(("b", 9L)), Seq(("b", 7L)),
      Seq(("pace", 18L)), Seq(("pace", 20L)), Seq(("pace", 21L))))
    assert(a2.filter(_.event_type == "b").map(_.last_seen_ms) ===
      Seq(T0 + 9 * Minute))
  }
}
