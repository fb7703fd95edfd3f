package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, LessThan}

/** `DELETE FROM` on eventlog stores: whole files whose zone maps
  * PROVE every row matches are unlinked and their removes recorded in
  * the manifest; a condition that cuts inside a file lands as a
  * DELETION VECTOR (row mask sidecar + live-stats entry update, zero
  * data rewrites — the deeper DV scenarios live in
  * [[EventLogDvSpec]]). */
class EventLogDeleteSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  /** Three day-split files: day 0 (ids 1,2), day 1 (id 3), day 2 (id 4). */
  private def daysStore(): String = {
    val dir = Files.createTempDirectory("geldel").toString
    Seq((1L, 10L, 7L, "a", 100L), (2L, 20L, 8L, "b", 200L),
        (3L, Day + 10L, 7L, "a", 300L), (4L, 2 * Day + 10L, 9L, "c", 400L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .withColumn("__day", expr("ts_us div 86400000000"))
      .repartition(col("__day")).drop("__day")
      .write.format("graft-eventlog").mode("append").save(dir)
    dir
  }

  private def register(dir: String): String = {
    val name = s"del_${Integer.toHexString(dir.hashCode)}"
    GraftCatalog.register(spark, name, dir)
    s"graft.$name"
  }

  test("a day-boundary retention delete unlinks whole files + manifest") {
    val dir = daysStore()
    assert(EventLog.listFiles(dir).size == 3)
    spark.sql(s"DELETE FROM ${register(dir)} WHERE ts_us < $Day")
    assert(EventLog.listFiles(dir).size == 2)
    assert(spark.read.format("graft-eventlog").load(dir)
      .select("event_id").as[Long].collect().sorted
      .sameElements(Array(3L, 4L)))
    // the manifest recorded the removes: planning stays header-free
    val man = EventLog.readManifest(dir)
    assert(EventLog.listFiles(dir).forall(f => man.contains(f.getName)))
    val h0 = EventLog.headerReads.get()
    assert(spark.read.format("graft-eventlog").load(dir).count() == 2)
    assert(EventLog.headerReads.get() == h0,
      "post-delete planning fell back to per-file header reads")
  }

  test("a condition cutting inside a file takes a DELETION VECTOR — zero rewrites") {
    val dir = daysStore()
    val before = EventLog.listFiles(dir)
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    // 15 is inside day 0's file (ts 10 and 20 straddle it): the cut
    // lands as a row mask, never a refusal, never a rewrite
    spark.sql(s"DELETE FROM ${register(dir)} WHERE ts_us < 15")
    assert(spark.read.format("graft-eventlog").load(dir)
      .select("event_id").as[Long].collect().sorted
      .sameElements(Array(2L, 3L, 4L)))
    // every data file survives byte-identical — the delete wrote only
    // a sidecar and a manifest segment
    val after = EventLog.listFiles(dir)
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    assert(after == before, "a DV delete rewrote or unlinked data files")
    assert(EventLogDv.anyIn(dir))
    // the manifest entry carries LIVE stats: metadata aggregates exact
    val man = EventLog.readManifest(dir)
    assert(man.values.map(_.count).sum == 3)
  }

  test("event_type deletes: whole files unlink, mixed files take a DV") {
    val dir = Files.createTempDirectory("geldel").toString
    Seq((1L, 10L, 7L, "a", 100L), (2L, 20L, 8L, "a", 200L),
        (3L, 30L, 9L, "b", 300L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .repartitionByRange(2, col("event_type"))
      .write.format("graft-eventlog").mode("append").save(dir)
    assert(EventLog.listFiles(dir).size == 2)
    spark.sql(s"DELETE FROM ${register(dir)} WHERE event_type = 'a'")
    assert(spark.read.format("graft-eventlog").load(dir)
      .select("event_id").as[Long].collect().sameElements(Array(3L)))

    // day 0 holds types a AND b in one file: the a-rows mask via DV,
    // day 1 (all-a) unlinks whole, day 2 (c) is untouched
    val mixed = daysStore()
    spark.sql(s"DELETE FROM ${register(mixed)} WHERE event_type = 'a'")
    assert(spark.read.format("graft-eventlog").load(mixed)
      .select("event_id").as[Long].collect().sorted
      .sameElements(Array(2L, 4L)))
    assert(EventLog.listFiles(mixed).size == 2, "all-a file not unlinked")
    assert(EventLogDv.anyIn(mixed), "mixed file did not take a DV")
    // the mixed file's entry dropped the dead type from its breakdown
    val day0 = EventLog.readManifest(mixed).values
      .find(_.minTs < Day).get
    assert(day0.types == Seq("b") && day0.count == 1)
  }

  test("TRUNCATE TABLE (delete-all) empties the store loudly-consistently") {
    val dir = daysStore()
    spark.sql(s"TRUNCATE TABLE ${register(dir)}")
    assert(EventLog.listFiles(dir).isEmpty)
    assert(spark.read.format("graft-eventlog").load(dir).count() == 0)
  }

  test("zoneAllMatch/zoneAdmits partition exactly at file granularity") {
    val h = EventLog.Header(2, 10L, 20L, Seq("a", "b"))
    assert(EventLog.zoneAllMatch(h, Array(LessThan("ts_us", 21L.asInstanceOf[java.lang.Long]))))
    assert(!EventLog.zoneAllMatch(h, Array(LessThan("ts_us", 20L.asInstanceOf[java.lang.Long]))))
    assert(EventLog.zoneAdmits(h, Array(LessThan("ts_us", 20L.asInstanceOf[java.lang.Long]))))
    assert(!EventLog.zoneAdmits(h, Array(LessThan("ts_us", 10L.asInstanceOf[java.lang.Long]))))
    // a two-type dictionary is never all-one-type
    assert(!EventLog.zoneAllMatch(h, Array(EqualTo("event_type", "a"))))
    assert(EventLog.zoneAllMatch(EventLog.Header(1, 10L, 10L, Seq("a")),
      Array(EqualTo("event_type", "a"))))
    // an unknown filter never proves a full match, always admits
    val unknown = EqualTo("user_id", 7L.asInstanceOf[java.lang.Long])
    assert(!EventLog.zoneAllMatch(h, Array(unknown)))
    assert(EventLog.zoneAdmits(h, Array(unknown)))
  }

  test("a changes window over a delete refuses (history was rewritten)") {
    val dir = daysStore()
    spark.sql(s"DELETE FROM ${register(dir)} WHERE ts_us < $Day")
    val v = EventLog.currentVersion(dir)
    val err = intercept[IllegalArgumentException] {
      EventLog.changedEntries(dir, 0, v)
    }
    assert(err.getMessage.contains("contains removes"))
    // a version RECORD read from BEFORE the delete references unlinked
    // files — physically unreadable, so it must be loud, not partial
    // (a bare count() is NOT: as-of aggregates push to the version's
    // manifest entries, which deliberately outlive the bytes)
    val snap = intercept[Exception] {
      spark.read.format("graft-eventlog").option("version", "1").load(dir)
        .select("event_id").collect()
    }
    assert(snap.getMessage.contains("no longer exists"))
  }
}
