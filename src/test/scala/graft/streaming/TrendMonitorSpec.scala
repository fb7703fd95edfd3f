package graft.streaming

import graft.queries.Inference
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Continuous OLS trend (transformWithState): after every micro-batch
  * the latest fit per type must equal batch q162 over the prefix seen
  * so far. Every planted type has day-0 data, so the per-type anchor
  * coincides with q162's global-min anchor and the equivalence is
  * exact — intercept included. */
class TrendMonitorSpec extends graft.SparkTestBase {
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

  /** (type, dayIdx) chunk → the events-frame shape q162 reads. Day 0 =
    * 2020-01-01, well past epoch so day indices are large — exercising
    * the anchor subtraction. */
  private def eventsFrame(rows: Seq[(String, Int)]): DataFrame =
    rows.zipWithIndex.map { case ((t, day), i) =>
      (i.toLong, new java.sql.Timestamp(1577836800000L + day * 86400000L),
        1L, t, 0.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  private def batchFits(prefix: Seq[(String, Int)]): Map[String, (Long, Option[Double], Option[Double], Option[Double])] =
    Inference.q162LinregTrendOn(eventsFrame(prefix))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("streamed fits equal batch q162 after every chunk") {
    withRocksDb {
      // two types, both present on day 0; counts drift apart over
      // chunks, and chunk 3 re-touches old days (out-of-order arrival)
      val chunks = Seq(
        Seq.fill(3)(("a", 0)) ++ Seq.fill(5)(("a", 1)) ++
          Seq.fill(2)(("b", 0)) ++ Seq.fill(2)(("b", 1)),
        Seq.fill(7)(("a", 2)) ++ Seq.fill(2)(("b", 2)) ++
          Seq.fill(4)(("b", 3)),
        Seq.fill(2)(("a", 0)) ++ Seq.fill(9)(("a", 3)) ++
          Seq.fill(1)(("b", 1)))
      val input = MemoryStream[(String, Long)](spark)
      val q = TrendMonitor.fits(input.toDS()).writeStream
        .format("memory").queryName("trend_fits")
        .outputMode(OutputMode.Update).start()
      try {
        var prefix = Seq.empty[(String, Int)]
        chunks.zipWithIndex.foreach { case (c, ci) =>
          input.addData(c.map { case (t, d) => (t, 18262L + d) })
          q.processAllAvailable()
          prefix = prefix ++ c
          val batch = batchFits(prefix)
          // memory sink in Update mode appends; latest row per type wins
          val streamed = spark.table("trend_fits")
            .withColumn("seq", monotonically_increasing_id())
            .orderBy(col("seq").desc)
            .as[(String, Long, Option[Double], Option[Double], Option[Double], Long)]
            .collect().groupBy(_._1)
            .map { case (t, rs) =>
              val r = rs.maxBy(_._6); t -> ((r._2, r._3, r._4, r._5))
            }
          assert(streamed === batch, s"diverged after chunk $ci")
        }
      } finally q.stop()
    }
  }

  test("single-day series emits None fits (q162's NULL semantics)") {
    withRocksDb {
      val input = MemoryStream[(String, Long)](spark)
      val q = TrendMonitor.fits(input.toDS()).writeStream
        .format("memory").queryName("trend_one")
        .outputMode(OutputMode.Update).start()
      try {
        input.addData(Seq(("x", 100L), ("x", 100L)))
        q.processAllAvailable()
        val row = spark.table("trend_one")
          .as[(String, Long, Option[Double], Option[Double], Option[Double])]
          .collect().head
        assert(row === (("x", 1L, None, None, None)))
      } finally q.stop()
    }
  }

  test("typedDays adapter maps ts to the epoch day index") {
    val df = eventsFrame(Seq(("a", 0), ("a", 2)))
    val got = TrendMonitor.typedDays(df).collect().toSet
    // 2020-01-01 is epoch day 18262
    assert(got === Set(("a", 18262L), ("a", 18264L)))
  }
}
