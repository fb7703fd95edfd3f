package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, In, LessThan}

/** The `event_id` KEY lane (round 9): point lookups and key ranges
  * prune whole files by the manifest's per-file id bounds, legacy
  * manifests admit everything, the delete-path dual stays
  * conservative, and the MERGE match pass decodes only candidate
  * files. */
class EventLogKeyLaneSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  // 3 days × 10 sequential ids each — day files carry tight DISJOINT
  // id ranges, the layout a chronological feed produces naturally
  private val rows = (0 until 30).map { i =>
    (i.toLong, (i / 10) * Day + i * 1000L, 100L + i % 4,
      if (i % 2 == 0) "a" else "b", i * 10L)
  }

  private def writeStore(): String = {
    val dir = Files.createTempDirectory("gelk").toString
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .withColumn("__day", expr("ts_us div 86400000000"))
      .repartition(col("__day"))
      .drop("__day")
      .write.format("graft-eventlog").mode("append").save(dir)
    dir
  }

  test("a point lookup opens exactly one file") {
    val dir = writeStore()
    assert(EventLog.listFiles(dir).size == 3)
    val skip0 = EventLog.skippedFiles.get()
    val plan0 = EventLog.plannedFiles.get()
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("event_id") === 17L)
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(rows(17)))
    assert(EventLog.plannedFiles.get() - plan0 == 1,
      "the key lookup planned more than its one file")
    assert(EventLog.skippedFiles.get() - skip0 == 2)
  }

  test("a key range plans only intersecting files") {
    val dir = writeStore()
    val plan0 = EventLog.plannedFiles.get()
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("event_id") >= 25L)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(got == rows.filter(_._1 >= 25L).toSet)
    assert(EventLog.plannedFiles.get() - plan0 == 1)
  }

  test("a manifest without id bounds admits everything, correctly") {
    val dir = writeStore()
    val legacy = EventLog.readManifest(dir).values.toSeq
      .map(_.copy(idBounds = None))
    EventLog.deleteManifest(dir)
    EventLog.appendManifest(dir, legacy)
    val skip0 = EventLog.skippedFiles.get()
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("event_id") === 17L)
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(rows(17)))
    assert(EventLog.skippedFiles.get() - skip0 == 0,
      "absent id bounds must admit every file (over-read, never drop)")
  }

  test("all-match dual: id bounds prove deletes only when present") {
    val some = EventLog.Header(3, 0L, 9L, Seq("a"), None, Some((5L, 9L)))
    val none = EventLog.Header(3, 0L, 9L, Seq("a"), None, None)
    assert(EventLog.zoneAllMatch(some, Array(GreaterThanOrEqual("event_id",
      java.lang.Long.valueOf(5L)))))
    assert(!EventLog.zoneAllMatch(some, Array(LessThan("event_id",
      java.lang.Long.valueOf(9L)))))
    assert(!EventLog.zoneAllMatch(none, Array(GreaterThanOrEqual("event_id",
      java.lang.Long.valueOf(0L)))),
      "a missing lane must never justify deleting a file")
    // admit side
    assert(EventLog.zoneAdmits(none, Array(EqualTo("event_id",
      java.lang.Long.valueOf(999L)))))
    assert(!EventLog.zoneAdmits(some, Array(EqualTo("event_id",
      java.lang.Long.valueOf(4L)))))
    assert(EventLog.zoneAdmits(some, Array(In("event_id",
      Array[Any](java.lang.Long.valueOf(4L), java.lang.Long.valueOf(7L))))))
  }

  test("a key-ranged DELETE unlinks whole files by the id lane") {
    val dir = writeStore()
    val name = s"key_${Integer.toHexString(dir.hashCode)}"
    GraftCatalog.register(spark, name, dir)
    spark.sql(s"DELETE FROM graft.$name WHERE event_id < 10")
    assert(EventLog.listFiles(dir).size == 2)
    assert(spark.read.format("graft-eventlog").load(dir).count() == 20)
  }

  test("the merge match pass decodes only key-intersecting files") {
    val dir = writeStore()
    // keys 3 and 7 live in day 0's file; days 1 and 2 are provably
    // untouched and must never be decoded
    val st = EventLogMerge.upsert(spark, dir, Seq(
      (3L, 3000L, 100L, "a", 999L), (7L, 7000L, 100L, "b", 888L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents"))
    assert(st.candidateFiles == 1,
      s"key-lane prune did not narrow the match pass: $st")
    assert(st.matched == 2 && st.rewrittenFiles == 1)
    val expect = rows.map {
      case r if r._1 == 3L => (3L, 3000L, 100L, "a", 999L)
      case r if r._1 == 7L => (7L, 7000L, 100L, "b", 888L)
      case r => r
    }.toSet
    assert(spark.read.format("graft-eventlog").load(dir)
      .as[(Long, Long, Long, String, Long)].collect().toSet == expect)
  }

  test("a merge against a bounds-less manifest decodes everything, correctly") {
    val dir = writeStore()
    val legacy = EventLog.readManifest(dir).values.toSeq
      .map(_.copy(idBounds = None))
    EventLog.deleteManifest(dir)
    EventLog.appendManifest(dir, legacy)
    val st = EventLogMerge.upsert(spark, dir, Seq(
      (3L, 3000L, 100L, "a", 999L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents"))
    assert(st.candidateFiles == 3 && st.matched == 1,
      s"absent bounds must keep every file a candidate: $st")
  }
}
