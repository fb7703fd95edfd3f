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

  test("maxFilesPerTrigger drains a backlog in bounded batches") {
    val dir = Files.createTempDirectory("gel_s").toString
    (0 until 6).foreach(d =>
      writeDay(dir, d, Seq((d * 10L + 1, 1000L, "a", d * 10L))))
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-eventlog")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => {
        batchSizes.add(df.count()); ()
      })
      .option("checkpointLocation", Files.createTempDirectory("gelck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.asScala.toSeq
    assert(sizes.sum == 6, s"rows lost or duplicated across batches: $sizes")
    // 6 one-row files at 2 files per trigger = 3 batches of exactly 2
    assert(sizes.count(_ > 0) == 3 && sizes.filter(_ > 0).forall(_ == 2),
      s"the backlog did not drain in bounded batches: $sizes")
  }

  test("admission control: limits compose; AvailableNow caps the listing") {
    val dir = Files.createTempDirectory("gel_s").toString
    (0 until 3).foreach(d =>
      writeDay(dir, d, Seq((d * 10L + 1, 1000L, "a", 1L))))
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val stream = new graft.sources.v2.EventLogMicroBatchStream(dir,
      Array("event_id"), _ => true, EventLog.OptPred.All, Some(2))
    val start = stream.initialOffset().asInstanceOf[EventLogOffset]
    // maxFiles(2) advances two names; a composite takes the tightest
    val o1 = stream.latestOffset(start, ReadLimit.maxFiles(2))
      .asInstanceOf[EventLogOffset]
    assert(o1.count == 2)
    val comp = ReadLimit.compositeLimit(Array(
      ReadLimit.maxFiles(1), ReadLimit.maxFiles(2)))
    assert(stream.latestOffset(start, comp)
      .asInstanceOf[EventLogOffset].count == 1)
    // no pending files → the SAME offset back (no empty batch)
    val end = stream.latestOffset(start, ReadLimit.allAvailable())
      .asInstanceOf[EventLogOffset]
    assert(stream.latestOffset(end, ReadLimit.allAvailable()) == end)
    // AvailableNow pins the end: later files are the next run's work
    stream.prepareForTriggerAvailableNow()
    writeDay(dir, 3, Seq((99L, 1000L, "a", 1L)))
    val capped = stream.latestOffset(start, ReadLimit.allAvailable())
      .asInstanceOf[EventLogOffset]
    assert(capped.count == 3, "AvailableNow must drain to the snapshot")
    // …while the uncapped report sees all four
    assert(stream.reportLatestOffset()
      .asInstanceOf[EventLogOffset].count == 4)
  }

  test("maxBytesPerTrigger admits files to the budget, never zero") {
    val dir = Files.createTempDirectory("gel_s").toString
    (0 until 4).foreach(d =>
      writeDay(dir, d, Seq((d * 10L + 1, 1000L, "a", 1L))))
    val oneFile = EventLog.listFiles(dir).head.length()
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val stream = new graft.sources.v2.EventLogMicroBatchStream(dir,
      Array("event_id"), _ => true, EventLog.OptPred.All,
      maxBytesPerTrigger = Some(2 * oneFile))
    // the declared default limit carries the byte budget
    assert(stream.getDefaultReadLimit.toString.contains("MaxBytes"))
    val start = stream.initialOffset().asInstanceOf[EventLogOffset]
    // a 2-file budget admits exactly 2 of the 4 equal-size files
    val o1 = stream.latestOffset(start, ReadLimit.maxBytes(2 * oneFile))
      .asInstanceOf[EventLogOffset]
    assert(o1.count == 2)
    // an under-sized budget still admits ONE file — a single
    // over-budget file must never wedge the tail
    assert(stream.latestOffset(start, ReadLimit.maxBytes(1L))
      .asInstanceOf[EventLogOffset].count == 1)
    // files and bytes compose: the tightest bound wins
    val comp = ReadLimit.compositeLimit(Array(
      ReadLimit.maxFiles(3), ReadLimit.maxBytes(oneFile)))
    assert(stream.latestOffset(start, comp)
      .asInstanceOf[EventLogOffset].count == 1)
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

  test("an option-scoped tail skips files at planning time and filters rows exactly") {
    // Spark 4 pushes no V2 filters into micro-batch scans, so source
    // OPTIONS are the stream's only file-skipping channel: the scoped
    // tail must never open files outside its ts window, and a window
    // edge INSIDE a surviving file must still cut row-level.
    val dir = Files.createTempDirectory("gel_s").toString
    val name = s"gel_${System.nanoTime()}"
    val q = spark.readStream.format("graft-eventlog")
      .option("ts.min", (Day + 1500L).toString)
      .load(dir)
      .select("event_id")
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("gelck").toString)
      .start()
    try {
      val skip0 = EventLog.skippedFiles.get()
      val plan0 = EventLog.plannedFiles.get()
      writeDay(dir, 0, Seq((1L, 1000L, "a", 10L)))  // wholly below: skip
      writeDay(dir, 1, Seq((2L, 1000L, "b", 20L),   // below the edge: row-cut
        (3L, 2000L, "b", 30L)))                     // admitted
      writeDay(dir, 2, Seq((4L, 0L, "c", 40L)))     // admitted
      q.processAllAvailable()
      assert(spark.table(name).as[Long].collect().toSet == Set(3L, 4L))
      assert(EventLog.skippedFiles.get() - skip0 == 1,
        "the day-0 file should be zone-skipped at stream planning time")
      assert(EventLog.plannedFiles.get() - plan0 == 2)
    } finally q.stop()
  }

  test("an event.type-scoped tail opens only that type's files") {
    val dir = Files.createTempDirectory("gel_s").toString
    val name = s"gel_${System.nanoTime()}"
    val q = spark.readStream.format("graft-eventlog")
      .option("event.type", "b")
      .load(dir)
      .select("event_id")
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("gelck").toString)
      .start()
    try {
      val skip0 = EventLog.skippedFiles.get()
      writeDay(dir, 0, Seq((1L, 1000L, "a", 10L), (2L, 2000L, "b", 20L)))
      writeDay(dir, 1, Seq((3L, 500L, "c", 30L))) // dictionary lacks b: skip
      q.processAllAvailable()
      assert(spark.table(name).as[Long].collect().toSet == Set(2L))
      assert(EventLog.skippedFiles.get() - skip0 == 1)
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

  test("compaction under a running tail fails LOUDLY — the single-maintainer contract is enforced, not documented") {
    // EventLogCompact is an OFFLINE maintenance op (class doc): merged
    // outputs replace committed inputs under new names, which moves
    // files beneath a committed stream watermark. The committed behavior
    // at that seam is a loud checkBoundary failure — never a tail that
    // silently re-reads or drops the moved day.
    val dir = Files.createTempDirectory("gel_s").toString
    writeDay(dir, 0, Seq((1L, 1000L, "a", 10L)))
    writeDay(dir, 0, Seq((2L, 2000L, "b", 20L))) // day 0 now fragmented
    val name = s"gel_${System.nanoTime()}"
    val q = spark.readStream.format("graft-eventlog").load(dir)
      .select("event_id")
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("gelck").toString)
      .start()
    try {
      q.processAllAvailable() // commits a watermark above both fragments
      assert(spark.table(name).as[Long].collect().toSet == Set(1L, 2L))
      val st = graft.sources.v2.EventLogCompact.compact(spark, dir)
      assert(st.groupsMerged == 1 && st.filesAfter < st.filesBefore)
      writeDay(dir, 1, Seq((3L, 500L, "c", 30L))) // wake the tail
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(_.contains("committed watermark")),
        "the moved boundary did not fail loudly: " + e.toString)
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
