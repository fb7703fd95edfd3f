package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** vacuum(): orphan temp sweep — old `.inprogress.*` residue of
  * hard-killed writers goes; fresh temps, intent-referenced temps, and
  * everything committed stay. */
class EventLogVacuumSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def store(): String = {
    val dir = Files.createTempDirectory("gelvac").toString
    Seq((1L, 10L, 7L, "a", 100L), (2L, 20L, 8L, "b", 200L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    dir
  }

  private def age(f: java.io.File, ms: Long): Unit =
    assert(f.setLastModified(System.currentTimeMillis() - ms))

  test("old orphans are swept; fresh temps and committed files stay") {
    val dir = store()
    val old1 = new java.io.File(dir, ".inprogress.deadbeef")
    val old2 = new java.io.File(dir, ".inprogress.stream.cafe")
    val fresh = new java.io.File(dir, ".inprogress.stream.live")
    Seq(old1, old2, fresh).foreach(f =>
      java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3)))
    Seq(old1, old2).foreach(age(_, 48L * 3600 * 1000))
    assert(EventLog.vacuum(dir) == 2)
    assert(!old1.exists() && !old2.exists())
    assert(fresh.exists(), "a fresh temp (possibly a live attempt) was swept")
    // committed data, manifest, and the store's answers are untouched
    assert(spark.read.format("graft-eventlog").load(dir).count() == 2)
    assert(EventLog.readManifest(dir).nonEmpty)
  }

  test("temps referenced by a pending sink intent survive any age") {
    val dir = store()
    // a crashed sink attempt: temp written, intent journaled, no rename
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new java.io.File(dir, s".inprogress.stream.$uuid")
    val entry = EventLog.writeGelFile(tmp, s"day_0-v$uuid.gel",
      Seq((9L, 30L, 9L, "c", 900L)))
    val wi = EventLogSink.getClass.getDeclaredMethods
      .find(_.getName == "writeIntent").get
    wi.setAccessible(true)
    wi.invoke(EventLogSink, dir, "qv", java.lang.Long.valueOf(0L),
      Seq(EventLogSink.Pending(tmp.getName, s"day_0-v$uuid.gel", entry)))
    age(tmp, 72L * 3600 * 1000)
    val intent = EventLogSink.intentFile(dir, "qv")
    age(intent, 72L * 3600 * 1000)
    assert(EventLog.vacuum(dir) == 0)
    assert(tmp.exists(), "vacuum amputated a pending intent's temp")
    assert(intent.exists(), "vacuum touched an intent file")
    // and the recovery the intent exists FOR still rolls forward
    EventLogSink.commitEpoch(dir, "qv", 0L, Nil)
    assert(spark.read.format("graft-eventlog").load(dir)
      .where(col("event_id") === 9L).count() == 1)
  }

  test("a maintenance sweep after a vacuumed crash leaves a clean store") {
    val dir = store()
    val orphanManifestTmp = new java.io.File(dir,
      ".inprogress.manifest.dead")
    val orphanMarkerTmp = new java.io.File(dir, ".inprogress.marker.dead")
    Seq(orphanManifestTmp, orphanMarkerTmp).foreach { f =>
      java.nio.file.Files.write(f.toPath, Array[Byte](0))
      age(f, 48L * 3600 * 1000)
    }
    assert(EventLog.vacuum(dir) == 2)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".inprogress")))
  }
}
