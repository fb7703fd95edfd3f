package graft.sources

import java.nio.file.Files

import graft.sources.v2.{EventLog, EventLogOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

/** The graft-eventlog micro-batch stream: incremental file tailing by
  * monotone-name watermark, streaming-side zone-map skipping under a
  * pushed predicate, offset round-trip, and the loud refusal of a file
  * that materializes below a committed watermark. */
class EventLogStreamSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  private def writeDay(dir: String, day: Long, rows: Seq[(Long, Long, String, Long)]): Unit =
    rows.map { case (id, off, tpe, cents) =>
      (id, day * Day + off, 100L + id, tpe, cents)
    }.toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)

  test("incremental tail: each new file arrives exactly once, in its own batch") {
    val dir = Files.createTempDirectory("gel_s").toString
    writeDay(dir, 0, Seq((1L, 1000L, "a", 10L), (2L, 2000L, "b", 20L)))
    val name = s"gel_${System.nanoTime()}"
    val q = spark.readStream.format("graft-eventlog").load(dir)
      .select("event_id", "cents")
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("gelck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).as[(Long, Long)].collect().toSet ==
        Set((1L, 10L), (2L, 20L)))
      writeDay(dir, 1, Seq((3L, 500L, "c", 30L)))
      writeDay(dir, 2, Seq((4L, 700L, "a", 40L)))
      q.processAllAvailable()
      assert(spark.table(name).as[(Long, Long)].collect().toSet ==
        Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
      // append-only memory sink: 4 distinct rows means nothing re-read
      assert(spark.table(name).count() == 4)
    } finally q.stop()
  }

  test("a ts predicate over the stream filters correctly (row-level)") {
    // Spark 4 does not run V2ScanRelationPushDown on micro-batch scans,
    // so the predicate never reaches the ScanBuilder (zone skipping is a
    // batch-scan optimization for now; the streaming planner still reads
    // headers through the same `survives` hook, which sees no pushed
    // filters and admits every file). Row-level correctness must hold
    // regardless.
    val dir = Files.createTempDirectory("gel_s").toString
    val name = s"gel_${System.nanoTime()}"
    val q = spark.readStream.format("graft-eventlog").load(dir)
      .where(col("ts_us") >= Day) // day-0 rows can never match
      .select("event_id")
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("gelck").toString)
      .start()
    try {
      writeDay(dir, 0, Seq((1L, 1000L, "a", 10L)))
      writeDay(dir, 1, Seq((2L, 500L, "b", 20L)))
      q.processAllAvailable()
      assert(spark.table(name).as[Long].collect().toSet == Set(2L))
    } finally q.stop()
  }

  test("a file below the committed watermark fails loudly, never silently skips") {
    val dir = Files.createTempDirectory("gel_s").toString
    writeDay(dir, 5, Seq((1L, 1000L, "a", 10L)))
    val name = s"gel_${System.nanoTime()}"
    val q = spark.readStream.format("graft-eventlog").load(dir)
      .select("event_id")
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("gelck").toString)
      .start()
    try {
      q.processAllAvailable()
      // an out-of-order producer: day 3 lands AFTER day 5 was committed
      writeDay(dir, 3, Seq((2L, 500L, "b", 20L)))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getMessage.contains("monotone file names") ||
        Option(e.getCause).exists(_.getMessage.contains("monotone file names")),
        e.toString)
    } finally q.stop()
  }

  test("offset json round-trips, including awkward names") {
    val cases = Seq(EventLogOffset("", 0),
      EventLogOffset("day_00005-p00001.gel", 3),
      EventLogOffset("""we"ird\name.gel""", 7))
    cases.foreach { o =>
      assert(EventLogOffset.fromJson(o.json()) == o)
    }
  }
}
