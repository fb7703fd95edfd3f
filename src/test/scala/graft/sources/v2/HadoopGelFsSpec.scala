package graft.sources.v2

import java.nio.file.Files

/** [[HadoopGelFs]] offline, against Hadoop's `file://` filesystem —
  * the same lifecycle the chroot fake proves for the interface, now
  * proven through the REAL cluster adapter: write, read, compact,
  * Z-order, merge, SQL DV delete, vacuum, all green with artifacts
  * byte-identical to a [[LocalGelFs]] store, no `.crc` pollution, and
  * the atomic-rename / create-exclusive contract asserted. */
class HadoopGelFsSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  test("the full store lifecycle runs through HadoopGelFs on file://") {
    val dir = Files.createTempDirectory("gelhadoop").toString
    EventLog.withFs(HadoopGelFs) {
      (0 to 2).foreach { d =>
        Seq((d * 10L + 1, d * Day + 1000L, 7L, "a", 5L),
            (d * 10L + 2, d * Day + 2000L, 8L, "b", 6L))
          .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
          .coalesce(1)
          .write.format("graft-eventlog").mode("append").save(dir)
      }
      assert(spark.read.format("graft-eventlog").load(dir).count() == 6)
      val st = EventLogCompact.compact(spark, dir)
      assert(st.groupsMerged >= 0)
      EventLogCompact.compact(spark, dir, zorder = true)
      val ms = EventLogMerge.upsert(spark, dir,
        Seq((1L, 1500L, 7L, "a", 99L), (500L, Day + 5L, 9L, "n", 1L))
          .toDF("event_id", "ts_us", "user_id", "event_type", "cents"))
      assert(ms.matched == 1 && ms.inserted == 1, ms.toString)
      val name = s"gelhd_${Integer.toHexString(dir.hashCode)}"
      GraftCatalog.register(spark, name, dir)
      spark.sql(s"DELETE FROM graft.$name WHERE ts_us < 1500")
      EventLog.vacuum(dir, graceMs = 0L)
      val got = spark.read.format("graft-eventlog").load(dir)
        .select("event_id", "cents").as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 99L, 2L -> 6L, 11L -> 5L, 12L -> 6L,
        21L -> 5L, 22L -> 6L, 500L -> 1L), got.toString)
      // time travel still answers across the maintenance history
      assert(EventLog.currentVersion(dir) >= 3)
    }
    // the checksummed local fs was unwrapped: no .crc sidecars pollute
    // the store (they would surface in every listing: vacuum, zone
    // maps, the orphan sweeps)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".crc")),
      s".crc pollution: ${names.mkString(", ")}")
  }

  test("HadoopGelFs artifacts are byte-identical to LocalGelFs artifacts") {
    val a = Files.createTempDirectory("gelhda").toString
    val b = Files.createTempDirectory("gelhdb").toString
    def write(dir: String): Unit =
      Seq((1L, 1000L, 7L, "a", 5L), (2L, 2000L, 8L, "b", 6L))
        .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
        .coalesce(1)
        .write.format("graft-eventlog").mode("append").save(dir)
    EventLog.withFs(LocalGelFs) { write(a) }
    EventLog.withFs(HadoopGelFs) { write(b) }
    def gelBytes(dir: String): Seq[Byte] = {
      val f = EventLog.listFiles(dir).head
      java.nio.file.Files.readAllBytes(f.toPath).toSeq
    }
    assert(gelBytes(a) == gelBytes(b), "artifact bytes diverged")
  }

  test("the lock primitives hold: create-exclusive, atomic rename, conditional delete") {
    val dir = Files.createTempDirectory("gelhdlock").toFile
    val lock = new java.io.File(dir, "_commit.lock")
    assert(HadoopGelFs.createNew(lock), "first claim must win")
    assert(!HadoopGelFs.createNew(lock), "second claim must lose")
    HadoopGelFs.writeAll(lock, "token".getBytes("UTF-8"))
    assert(new String(HadoopGelFs.readAll(lock), "UTF-8") == "token")
    val moved = new java.io.File(dir, ".release.lock.token")
    assert(HadoopGelFs.rename(lock, moved), "rename must succeed")
    assert(!HadoopGelFs.isFile(lock) && HadoopGelFs.isFile(moved),
      "rename must move, not copy")
    assert(!HadoopGelFs.rename(lock, moved),
      "renaming an absent source must report failure")
    assert(HadoopGelFs.delete(moved))
    assert(!HadoopGelFs.isFile(moved))
    // touch refreshes mtime (the lock heartbeat)
    val hb = new java.io.File(dir, "hb")
    HadoopGelFs.writeAll(hb, Array[Byte](1))
    val t0 = HadoopGelFs.lastModified(hb)
    Thread.sleep(1100)
    HadoopGelFs.touch(hb)
    assert(HadoopGelFs.lastModified(hb) > t0, "touch must refresh mtime")
  }

  test("a commit-locked store works through HadoopGelFs (owned release end-to-end)") {
    val dir = Files.createTempDirectory("gelhdc").toString
    EventLog.withFs(HadoopGelFs) {
      Seq((1L, 1000L, 7L, "a", 5L))
        .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
        .coalesce(1)
        .write.format("graft-eventlog").mode("append").save(dir)
      val entry = EventLog.readManifest(dir).values.head
      val before = EventLog.currentVersion(dir)
      assert(EventLog.appendManifest(dir, Seq(entry)) > before)
      assert(!HadoopGelFs.isFile(
        new java.io.File(dir, EventLog.CommitLockName)),
        "commit left its lock behind")
    }
  }
}
