package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Deletion vectors ([[EventLogDv]]): row-level DELETE with zero data
  * rewrites, the manifest-append commit point (a torn delete reads as
  * never-happened), count-keyed cumulative masks (row-level time
  * travel across STACKED deletes reads each version's own state),
  * metadata exactness from live entries, the plain changes feed's
  * in-place-update refusal, LIMIT/OFFSET pushdown refusal, and the DV
  * fold through compaction and merge. */
class EventLogDvSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  /** Two day files: day 0 = ids 1..4 (users 1,2,3,4), day 1 = ids
    * 5..8 (users 5,6,7,8); cents = id*100. */
  private val rows = (1 to 8).map { i =>
    (i.toLong, (if (i <= 4) 0L else Day) + i * 1000L, i.toLong,
      if (i % 2 == 0) "even" else "odd", i * 100L)
  }

  private def store(): String = {
    val dir = Files.createTempDirectory("geldv").toString
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .withColumn("__day", expr("ts_us div 86400000000"))
      .repartition(col("__day")).drop("__day")
      .write.format("graft-eventlog").mode("append").save(dir)
    dir
  }

  private def register(dir: String): String = {
    val name = s"dv_${Integer.toHexString(dir.hashCode)}"
    GraftCatalog.register(spark, name, dir)
    s"graft.$name"
  }

  private def ids(dir: String, opts: Map[String, String] = Map.empty): Seq[Long] = {
    var r = spark.read.format("graft-eventlog")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load(dir).select("event_id").as[Long].collect().sorted.toSeq
  }

  test("stacked deletes: each version's row reads apply its own mask") {
    val dir = store()
    val t = register(dir)
    spark.sql(s"DELETE FROM $t WHERE user_id = 2")   // version 2
    spark.sql(s"DELETE FROM $t WHERE user_id = 7")   // version 3
    assert(ids(dir) == Seq(1L, 3L, 4L, 5L, 6L, 8L))
    // version 1: before any delete — unmasked
    assert(ids(dir, Map("version" -> "1")) == (1L to 8L))
    // version 2: first mask only (id 2 dead, id 7 alive)
    assert(ids(dir, Map("version" -> "2")) == Seq(1L, 3L, 4L, 5L, 6L, 7L, 8L))
    // version 3: cumulative mask
    assert(ids(dir, Map("version" -> "3")) == Seq(1L, 3L, 4L, 5L, 6L, 8L))
    // two sidecar generations coexist (count-keyed names)
    val dvs = new java.io.File(dir).listFiles()
      .filter(f => EventLogDv.dataFileOf(f.getName).isDefined)
    assert(dvs.length == 2, dvs.map(_.getName).mkString(","))
  }

  test("metadata aggregates answer live-exact from the updated entries") {
    val dir = store()
    spark.sql(s"DELETE FROM ${register(dir)} WHERE cents <= 300")
    val g0 = EventLogStatsScan.manifestOnlyGroupScans.get()
    val got = spark.read.format("graft-eventlog").load(dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(EventLogStatsScan.manifestOnlyGroupScans.get() == g0 + 1,
      "grouped aggregate did not answer from the manifest")
    // live rows: ids 4..8 → even {4,6,8}=1800, odd {5,7}=1200
    assert(got == Map("even" -> ((3L, 1800L)), "odd" -> ((2L, 1200L))))
  }

  test("the manifest append is the commit point: an uncommitted DV reads as never-happened") {
    val dir = store()
    val f = EventLog.listFiles(dir).minBy(_.getName)
    // a crashed delete: sidecar renamed in, manifest never appended
    EventLogDv.write(f, 4, Seq(0, 1))
    assert(ids(dir) == (1L to 8L), "an uncommitted mask was applied")
    // re-running the delete commits it
    spark.sql(s"DELETE FROM ${register(dir)} WHERE event_id <= 2")
    assert(ids(dir) == (3L to 8L))
  }

  test("a plain changes window over a DV commit refuses loudly") {
    val dir = store()
    spark.sql(s"DELETE FROM ${register(dir)} WHERE user_id = 2")
    val v = EventLog.currentVersion(dir)
    val err = intercept[IllegalArgumentException] {
      EventLog.changedEntries(dir, 0, v)
    }
    // the refusal names the typed feed that CAN serve the commit
    assert(err.getMessage.contains("cdc.typed"))
  }

  test("LIMIT and OFFSET pushdown refuse on a DV store; plans stay correct") {
    val dir = store()
    spark.sql(s"DELETE FROM ${register(dir)} WHERE user_id = 3")
    val limPlan = spark.read.format("graft-eventlog").load(dir)
      .limit(2).queryExecution.executedPlan.toString
    assert(limPlan.contains("limit=") == false,
      s"limit was pushed into a DV store scan:\n$limPlan")
    val offDf = spark.read.format("graft-eventlog").load(dir).offset(3)
    assert(offDf.queryExecution.executedPlan.toString.contains("offset=")
      == false, "offset was pushed into a DV store scan")
    // and the unpushed forms still answer over LIVE rows
    assert(offDf.count() == 4) // 7 live - 3
  }

  test("compaction folds DVs away; contents and manifest stay exact") {
    val dir = store()
    spark.sql(s"DELETE FROM ${register(dir)} WHERE event_id IN (1, 2)")
    // fragment day 0 (the DV'd day) with a second append so compaction
    // rewrites exactly the masked file
    Seq((100L, 50L, 9L, "odd", 1L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .write.format("graft-eventlog").mode("append").save(dir)
    val st = EventLogCompact.compact(spark, dir)
    assert(st.groupsMerged >= 1)
    assert(!EventLogDv.anyIn(dir), "compaction left a deletion vector")
    assert(ids(dir) == Seq(3L, 4L, 5L, 6L, 7L, 8L, 100L))
    assert(EventLog.readManifest(dir).values.map(_.count).sum == 7)
  }

  test("merge reads through the mask: a DV-dead key re-inserts, rewrite folds the DV") {
    val dir = store()
    spark.sql(s"DELETE FROM ${register(dir)} WHERE event_id = 3")
    // upsert key 3 (dead → NOT matched → insert) and key 4 (live →
    // update); the day-0 rewrite drops dead rows and the sidecar
    val st = EventLogMerge.upsert(spark, dir, Seq(
      (3L, 3500L, 3L, "odd", 999L), (4L, 4000L, 4L, "even", 888L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents"))
    assert(st.matched == 1 && st.inserted == 1, st.toString)
    assert(!EventLogDv.anyIn(dir), "merge rewrite left a deletion vector")
    val got = spark.read.format("graft-eventlog").load(dir)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(got.contains((3L, 3500L, 3L, "odd", 999L)))
    assert(got.contains((4L, 4000L, 4L, "even", 888L)))
    assert(got.size == 8) // 8 - 1 dead + 1 re-insert; update in place
  }

  test("vacuum sweeps orphaned DV sidecars, keeps live ones") {
    val dir = store()
    spark.sql(s"DELETE FROM ${register(dir)} WHERE event_id = 1")
    val live = new java.io.File(dir).listFiles()
      .filter(f => EventLogDv.dataFileOf(f.getName).isDefined)
    assert(live.length == 1)
    val orphan = new java.io.File(dir, "day_99999-gone.gel.dv-3.geldv")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1))
    assert(EventLog.vacuum(dir) == 1)
    assert(!orphan.exists() && live.head.exists())
  }

  test("DV codec rails: empty and all-dead masks refuse; superseded views are loud") {
    val dir = store()
    val f = EventLog.listFiles(dir).minBy(_.getName) // 4 records
    intercept[IllegalArgumentException] {
      EventLogDv.write(f, 4, Nil)
    }
    intercept[IllegalArgumentException] {
      EventLogDv.write(f, 4, Seq(0, 1, 2, 3))
    }
    EventLogDv.write(f, 4, Seq(0))
    // a view expecting a live count no sidecar matches refuses loudly
    val e = intercept[IllegalStateException] {
      EventLogDv.maskFor(f, 4, 2)
    }
    assert(e.getMessage.contains("no deletion vector"))
    assert(EventLogDv.maskFor(f, 4, 4).isEmpty) // pre-delete: unmasked
    assert(EventLogDv.maskFor(f, 4, 3).exists(_.live == 3))
  }
}
