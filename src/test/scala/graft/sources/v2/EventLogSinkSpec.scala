package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class SinkEv(event_id: Long, ts_us: Long, user_id: Long,
  event_type: String, cents: Long)

/** The streaming sink's exactly-once epoch protocol: tasks write
  * invisible temps, the epoch commit publishes under an intent journal,
  * replayed epochs discard, and every crash window between intent and
  * marker rolls forward to exactly one copy. */
class EventLogSinkSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  test("a multi-epoch MemoryStream lands exactly once, manifest-covered") {
    val dir = Files.createTempDirectory("gelsink").toString
    val input = MemoryStream[SinkEv](spark)
    val q = input.toDF().writeStream.format("graft-eventlog")
      .option("checkpointLocation",
        Files.createTempDirectory("gelsink-ckpt").toString)
      .start(dir)
    try {
      input.addData(SinkEv(1L, 10L, 7L, "a", 100L),
        SinkEv(2L, Day + 10L, 8L, "b", 200L))
      q.processAllAvailable()
      input.addData(SinkEv(3L, 2 * Day + 10L, 9L, "a", 300L))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.format("graft-eventlog").load(dir)
    assert(back.select("event_id").as[Long].collect().sorted
      .sameElements(Array(1L, 2L, 3L)))
    // every published file is manifested: planning stays header-free
    val man = EventLog.readManifest(dir)
    assert(EventLog.listFiles(dir).nonEmpty)
    assert(EventLog.listFiles(dir).forall(f => man.contains(f.getName)))
    val h0 = EventLog.headerReads.get()
    assert(spark.read.format("graft-eventlog").load(dir).count() == 3)
    assert(EventLog.headerReads.get() == h0)
    // no temps left behind
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".inprogress")))
    // the sums lane arrived through the epoch path too
    assert(spark.read.format("graft-eventlog").load(dir)
      .agg(sum("cents")).head().getLong(0) == 600L)
  }

  private def pendingOf(dir: String, id: Long, ts: Long,
      tpe: String): EventLogSink.Pending = {
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new java.io.File(dir, s".inprogress.stream.$uuid")
    val fin = s"day_${Math.floorDiv(ts, Day)}-t$uuid.gel"
    val entry = EventLog.writeGelFile(tmp, fin,
      Seq((id, ts, 7L, tpe, id * 10L)))
    EventLogSink.Pending(tmp.getName, fin, entry)
  }

  test("a replayed epoch is discarded — its temps deleted, no duplicates") {
    val dir = Files.createTempDirectory("gelsink").toString
    EventLogSink.commitEpoch(dir, "q1", 0L, Seq(pendingOf(dir, 1L, 10L, "a")))
    assert(EventLogSink.lastCommitted(dir, "q1") == 0L)
    // the replay writes NEW temps for the same epoch id
    val replay = pendingOf(dir, 2L, 20L, "a")
    EventLogSink.commitEpoch(dir, "q1", 0L, Seq(replay))
    assert(spark.read.format("graft-eventlog").load(dir)
      .select("event_id").as[Long].collect().sameElements(Array(1L)))
    assert(!new java.io.File(dir, replay.temp).exists())
    assert(!new java.io.File(dir, replay.fin).exists())
  }

  test("crash after intent, before renames: the replay rolls it forward") {
    val dir = Files.createTempDirectory("gelsink").toString
    // first attempt: intent journaled, nothing renamed (the crash)
    val attempt1 = pendingOf(dir, 1L, 10L, "a")
    val m = EventLogSink.getClass.getDeclaredMethods
      .find(_.getName == "writeIntent").get
    m.setAccessible(true)
    m.invoke(EventLogSink, dir, "q1", java.lang.Long.valueOf(0L),
      Seq(attempt1))
    assert(EventLog.listFiles(dir).isEmpty) // invisible to readers
    // the restarted query re-runs epoch 0 with fresh temps
    EventLogSink.commitEpoch(dir, "q1", 0L, Seq(pendingOf(dir, 2L, 20L, "a")))
    // the FIRST attempt's row is the one published, exactly once
    assert(spark.read.format("graft-eventlog").load(dir)
      .select("event_id").as[Long].collect().sameElements(Array(1L)))
    assert(EventLogSink.lastCommitted(dir, "q1") == 0L)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".inprogress")))
  }

  test("crash after renames+manifest, before marker: recovery is exact") {
    val dir = Files.createTempDirectory("gelsink").toString
    val attempt1 = pendingOf(dir, 1L, 10L, "a")
    val wi = EventLogSink.getClass.getDeclaredMethods
      .find(_.getName == "writeIntent").get
    wi.setAccessible(true)
    wi.invoke(EventLogSink, dir, "q1", java.lang.Long.valueOf(0L),
      Seq(attempt1))
    // the crash hit AFTER publish and manifest, before the marker
    assert(new java.io.File(dir, attempt1.temp)
      .renameTo(new java.io.File(dir, attempt1.fin)))
    EventLog.appendManifest(dir, Seq(attempt1.entry))
    EventLogSink.commitEpoch(dir, "q1", 0L, Seq(pendingOf(dir, 2L, 20L, "a")))
    assert(spark.read.format("graft-eventlog").load(dir)
      .select("event_id").as[Long].collect().sameElements(Array(1L)))
    // the double manifest append collapsed by name — one entry
    assert(EventLog.readManifest(dir).size == 1)
  }

  test("epoch abort deletes temps and leaves the store untouched") {
    val dir = Files.createTempDirectory("gelsink").toString
    EventLogSink.commitEpoch(dir, "q1", 0L, Seq(pendingOf(dir, 1L, 10L, "a")))
    val doomed = pendingOf(dir, 2L, 20L, "a")
    new EventLogStreamingWrite(dir, "q1").abort(1L,
      Array(EventLogSink.EpochCommit(Seq(doomed))))
    assert(!new java.io.File(dir, doomed.temp).exists())
    assert(spark.read.format("graft-eventlog").load(dir).count() == 1)
    assert(EventLogSink.lastCommitted(dir, "q1") == 0L)
  }

  test("independent queries feed one store under separate epoch tracks") {
    val dir = Files.createTempDirectory("gelsink").toString
    EventLogSink.commitEpoch(dir, "qA", 5L, Seq(pendingOf(dir, 1L, 10L, "a")))
    EventLogSink.commitEpoch(dir, "qB", 0L, Seq(pendingOf(dir, 2L, 20L, "b")))
    assert(EventLogSink.lastCommitted(dir, "qA") == 5L)
    assert(EventLogSink.lastCommitted(dir, "qB") == 0L)
    assert(spark.read.format("graft-eventlog").load(dir).count() == 2)
  }

  test("bucketed stores and complete mode refuse the streaming sink") {
    val dir = Files.createTempDirectory("gelsink").toString
    Seq((1L, 10L, 7L, "a", 100L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .write.format("graft-eventlog")
      .option("bucket.by", "user_id").option("bucket.count", "2")
      .mode("append").save(dir)
    val bucketed = intercept[IllegalArgumentException] {
      new EventLogStreamingWrite(dir, "q1")
    }
    assert(bucketed.getMessage.contains("bucketed store"))
    val complete = intercept[IllegalArgumentException] {
      new EventLogWriteBuilder(dir, EventLog.Schema).truncate()
        .asInstanceOf[EventLogWriteBuilder].build().toStreaming
    }
    assert(complete.getMessage.contains("append-only"))
  }

  test("q295: the streamed store matches the corpus per type (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q295_eventlog_stream_sink")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.sources.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("cents_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
