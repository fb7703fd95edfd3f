package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** `mode("overwrite")` on eventlog stores (SupportsTruncate): the new
  * data replaces everything — old data files, the manifest log (version
  * history resets), and the bucketing marker — at job commit. */
class EventLogOverwriteSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  private def rows(ids: Long*) =
    ids.map(i => (i, (i % 3) * Day + i, i, s"t${i % 2}", i * 10L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents")

  test("overwrite replaces contents, manifest, and version history") {
    val dir = Files.createTempDirectory("gelow").toString
    rows(1L, 2L, 3L).coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    rows(4L, 5L).coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    assert(EventLog.currentVersion(dir) == 2L)
    rows(7L, 8L).coalesce(1)
      .write.format("graft-eventlog").mode("overwrite").save(dir)
    assert(spark.read.format("graft-eventlog").load(dir)
      .select("event_id").as[Long].collect().sorted
      .sameElements(Array(7L, 8L)))
    // the manifest covers exactly the surviving files (planning stays
    // header-free) and history restarted at version 1
    val man = EventLog.readManifest(dir)
    assert(EventLog.listFiles(dir).map(_.getName).toSet == man.keySet)
    assert(EventLog.currentVersion(dir) == 1L)
    val h0 = EventLog.headerReads.get()
    assert(spark.read.format("graft-eventlog").load(dir).count() == 2)
    assert(EventLog.headerReads.get() == h0)
  }

  test("overwrite re-layouts: bucketed -> plain and plain -> bucketed") {
    val dir = Files.createTempDirectory("gelow").toString
    rows(1L, 2L, 3L, 4L)
      .write.format("graft-eventlog")
      .option("bucket.by", "user_id").option("bucket.count", "4")
      .mode("append").save(dir)
    assert(EventLog.readBucketing(dir).contains(4))
    // a plain APPEND on the bucketed store still refuses…
    val err = intercept[Exception] {
      rows(9L).write.format("graft-eventlog").mode("append").save(dir)
    }
    assert(err.getMessage.contains("bucketed store"))
    // …but a plain OVERWRITE is a rewrite: the marker goes with the data
    rows(5L, 6L).coalesce(1)
      .write.format("graft-eventlog").mode("overwrite").save(dir)
    assert(EventLog.readBucketing(dir).isEmpty)
    assert(spark.read.format("graft-eventlog").load(dir)
      .select("event_id").as[Long].collect().sorted
      .sameElements(Array(5L, 6L)))
    // and back: an overwrite can re-bucket with a DIFFERENT count
    rows(1L, 2L, 3L)
      .write.format("graft-eventlog")
      .option("bucket.by", "user_id").option("bucket.count", "2")
      .mode("overwrite").save(dir)
    assert(EventLog.readBucketing(dir).contains(2))
    assert(spark.read.format("graft-eventlog").load(dir).count() == 3)
  }

  test("an empty overwrite leaves an empty, readable store") {
    val dir = Files.createTempDirectory("gelow").toString
    rows(1L, 2L).coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    rows().where(lit(false))
      .write.format("graft-eventlog").mode("overwrite").save(dir)
    assert(EventLog.listFiles(dir).isEmpty)
    assert(spark.read.format("graft-eventlog").load(dir).count() == 0)
  }

  test("appends after an overwrite extend the new history") {
    val dir = Files.createTempDirectory("gelow").toString
    rows(1L, 2L).coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    rows(3L).coalesce(1)
      .write.format("graft-eventlog").mode("overwrite").save(dir)
    rows(4L).coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    assert(EventLog.currentVersion(dir) == 2L)
    assert(spark.read.format("graft-eventlog")
      .option("version", "1").load(dir)
      .select("event_id").as[Long].collect().sameElements(Array(3L)))
    assert(spark.read.format("graft-eventlog").load(dir)
      .select("event_id").as[Long].collect().sorted
      .sameElements(Array(3L, 4L)))
  }
}
