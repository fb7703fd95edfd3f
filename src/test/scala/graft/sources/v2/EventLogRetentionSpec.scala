package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** TIME-TRAVEL RETENTION (round 11): `EventLog.setRetention(dir, N)` /
  * `CALL graft.set_retention(store, N)` declares "keep the last N
  * versions row-readable", and maintenance HONORS it — rewrites leave
  * their replaced inputs on disk (removed-but-listed, invisible to
  * current planning), the checkpoint fold defers absorbing protected
  * segments, and vacuum never reclaims a protected remove. Expiry is
  * the fold itself: absorbing a remove sweeps its bytes, so an expired
  * version refuses loudly while a protected one still row-reads. */
class EventLogRetentionSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  private def writeDay(dir: String, day: Long, id: Long,
      cents: Long): Unit =
    Seq((id, day * Day + id, 7L, "a", cents))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)

  private def readAsOf(dir: String, v: Long) =
    spark.read.format("graft-eventlog").option("version", v.toString)
      .load(dir)

  test("a protected version still ROW-reads after compaction; without retention it refuses") {
    // WITHOUT retention (the default): compaction unlinks its inputs,
    // so a pre-compact version's row read refuses loudly
    val plain = Files.createTempDirectory("gelret").toString
    writeDay(plain, 0, 1L, 10L); writeDay(plain, 0, 2L, 20L)
    val vPre0 = EventLog.currentVersion(plain)
    EventLogCompact.compact(spark, plain)
    val e0 = intercept[Exception] { readAsOf(plain, vPre0).collect() }
    assert(e0 != null) // bytes gone — loud, never silent

    // WITH retention: the replaced inputs survive the swap
    val dir = Files.createTempDirectory("gelret").toString
    EventLog.setRetention(dir, 8)
    writeDay(dir, 0, 1L, 10L); writeDay(dir, 0, 2L, 20L)
    val vPre = EventLog.currentVersion(dir)
    val filesPre = EventLog.listFiles(dir).map(_.getName).toSet
    EventLogCompact.compact(spark, dir)
    // current read serves the compacted layout…
    assert(spark.read.format("graft-eventlog").load(dir)
      .agg(sum("cents")).head.getLong(0) == 30L)
    assert(EventLog.readManifest(dir).size == 1, "day did not compact")
    // …while the replaced inputs are still on disk for time travel
    assert(filesPre.subsetOf(
      EventLog.listFiles(dir).map(_.getName).toSet),
      "retention did not keep the replaced inputs")
    val pre = readAsOf(dir, vPre).select("event_id", "cents")
      .as[(Long, Long)].collect().toMap
    assert(pre == Map(1L -> 10L, 2L -> 20L),
      s"protected version lost its rows: $pre")
  }

  test("vacuum never reclaims a protected remove; expiry fold does") {
    val dir = Files.createTempDirectory("gelret").toString
    EventLog.setRetention(dir, 4)
    writeDay(dir, 0, 1L, 10L); writeDay(dir, 0, 2L, 20L)
    EventLogCompact.compact(spark, dir) // removes the two inputs
    val replaced = EventLog.commitHistory(dir).last._3
    assert(replaced.nonEmpty)
    // vacuum with zero grace: protected removes survive
    EventLog.vacuum(dir, graceMs = 0L)
    replaced.foreach(n => assert(new java.io.File(dir, n).isFile,
      s"vacuum reclaimed protected $n"))
    // push the rewrite out of retention AND past the fold cadence
    (1 to EventLog.CheckpointEvery + 4).foreach(i =>
      writeDay(dir, 1 + i.toLong, 100L + i, 1L))
    // the expiry fold absorbed the rewrite's segment and swept its
    // dead bytes
    replaced.foreach(n => assert(!new java.io.File(dir, n).exists(),
      s"expiry did not reclaim $n"))
    // and the expired version now refuses loudly
    val vGone = 2L // the pre-compact version
    val e = intercept[Exception] { readAsOf(dir, vGone).collect() }
    assert(e.getMessage != null)
    // current contents intact throughout
    assert(spark.read.format("graft-eventlog").load(dir).count() ==
      2L + EventLog.CheckpointEvery + 4)
  }

  test("protected versions survive the fold: segments inside the window stay") {
    val dir = Files.createTempDirectory("gelret").toString
    EventLog.setRetention(dir, 4)
    (1 to EventLog.CheckpointEvery + 8).foreach(i =>
      writeDay(dir, i.toLong, i.toLong, i.toLong))
    val cur = EventLog.currentVersion(dir)
    // a version inside the window still manifests-reads
    val vProt = cur - 2
    assert(EventLog.readManifestAsOf(dir, vProt).size == vProt)
    // one below the fold point refuses with the retention bound named
    val folded = (1 to 10).collectFirst {
      case _ => // probe: find the refusal floor by asking readManifestAsOf
        val e = intercept[IllegalArgumentException] {
          EventLog.readManifestAsOf(dir, 1L)
        }
        e
    }.get
    assert(folded.getMessage.contains("absorbed into the checkpoint"))
  }

  test("AGE-based retention: young rewrites keep bytes; aged ones expire at the fold") {
    val dir = Files.createTempDirectory("gelret").toString
    // generous window first: the rewrite is protected
    EventLog.setRetentionMs(dir, 3600L * 1000)
    writeDay(dir, 0, 1L, 10L); writeDay(dir, 0, 2L, 20L)
    val vPre = EventLog.currentVersion(dir)
    EventLogCompact.compact(spark, dir)
    val replaced = EventLog.commitHistory(dir).last._3
    assert(replaced.nonEmpty)
    EventLog.vacuum(dir, graceMs = 0L)
    replaced.foreach(n => assert(new java.io.File(dir, n).isFile,
      s"vacuum reclaimed age-protected $n"))
    assert(readAsOf(dir, vPre).count() == 2)
    // shrink the window below the segments' age: the next fold
    // absorbs them and sweeps the dead bytes
    EventLog.setRetentionMs(dir, 1L)
    Thread.sleep(30)
    (1 to EventLog.CheckpointEvery + 2).foreach { i =>
      writeDay(dir, 1 + i.toLong, 100L + i, 1L)
      Thread.sleep(2) // segment mtimes age past the 1 ms window
    }
    replaced.foreach(n => assert(!new java.io.File(dir, n).exists(),
      s"age expiry did not reclaim $n"))
    val e = intercept[Exception] { readAsOf(dir, vPre).collect() }
    assert(e.getMessage != null)
    assert(spark.read.format("graft-eventlog").load(dir).count() ==
      2L + EventLog.CheckpointEvery + 2)
  }

  test("SQL surface: CALL graft.set_retention, then a protected DELETE's day still reads") {
    val dir = Files.createTempDirectory("gelret").toString
    writeDay(dir, 0, 1L, 10L); writeDay(dir, 1, 2L, 20L)
    val name = s"ret_${Integer.toHexString(dir.hashCode)}"
    GraftCatalog.register(spark, name, dir)
    val out = spark.sql(s"CALL graft.set_retention('$name', 6)").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(6))
    assert(EventLog.readRetention(dir)
      .contains(EventLog.Retention.Versions(6)))
    val vPre = EventLog.currentVersion(dir)
    // whole-file retention delete: day 0 unlink is DEFERRED
    spark.sql(s"DELETE FROM graft.$name WHERE ts_us < $Day")
    assert(spark.read.format("graft-eventlog").load(dir).count() == 1)
    val pre = readAsOf(dir, vPre).select("event_id").as[Long]
      .collect().sorted.toSeq
    assert(pre == Seq(1L, 2L), s"protected pre-delete version lost rows: $pre")
    // clearing the policy restores eager behavior
    spark.sql(s"CALL graft.set_retention('$name', 0)")
    assert(EventLog.readRetention(dir).isEmpty)
  }
}
