package graft.sources.v2

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

/** A [[GelFs]] implementation that REMAPS every path under a chroot
  * and COUNTS operations — the bypass detector: code that touches
  * `java.io` directly would read/write the VIRTUAL path (which does
  * not exist on the real filesystem), so any store built and
  * maintained under this fs proves the whole v2 package routes
  * through the interface. */
class ChrootGelFs(root: java.io.File) extends GelFs {
  val ops = new AtomicLong(0)
  private def real(f: java.io.File): java.io.File = {
    ops.incrementAndGet()
    new java.io.File(root, f.getPath)
  }
  private def virt(parent: java.io.File, name: String): java.io.File =
    new java.io.File(parent, name)
  override def mkdirs(dir: java.io.File): Unit = { real(dir).mkdirs(); () }
  override def listFiles(dir: java.io.File): Seq[java.io.File] =
    Option(real(dir).listFiles()).map(_.toSeq).getOrElse(Nil)
      .map(f => virt(dir, f.getName))
  override def isFile(f: java.io.File): Boolean = real(f).isFile
  override def isDirectory(f: java.io.File): Boolean = real(f).isDirectory
  override def length(f: java.io.File): Long = real(f).length()
  override def lastModified(f: java.io.File): Long = real(f).lastModified()
  override def mtimeNanos(f: java.io.File): Long =
    java.nio.file.Files.getLastModifiedTime(real(f).toPath)
      .to(java.util.concurrent.TimeUnit.NANOSECONDS)
  override def openRead(f: java.io.File): java.io.InputStream =
    new java.io.FileInputStream(real(f))
  override def openWrite(f: java.io.File): java.io.OutputStream =
    new java.io.FileOutputStream(real(f))
  override def rename(src: java.io.File, dst: java.io.File): Boolean =
    real(src).renameTo(real(dst))
  override def delete(f: java.io.File): Boolean = real(f).delete()
  override def createNew(f: java.io.File): Boolean =
    try real(f).createNewFile()
    catch { case _: java.io.IOException => false }
  override def touch(f: java.io.File): Unit = {
    real(f).setLastModified(System.currentTimeMillis()); ()
  }
  override def readAll(f: java.io.File): Array[Byte] =
    java.nio.file.Files.readAllBytes(real(f).toPath)
}

/** CLUSTER-FS ABSTRACTION (round 11, the last 100 TB boundary): every
  * filesystem operation of the v2 package goes through [[GelFs]] —
  * `java.io.File` is a pure path value, [[LocalGelFs]] the local-
  * mount implementation, and a Hadoop `FileSystem` adapter needs only
  * the trait's twelve methods. Proven two ways: (1) the ENTIRE store
  * lifecycle — write, read, compact, Z-order, merge, DV delete,
  * vacuum, manifest fold — runs under a CHROOT fake whose virtual
  * paths don't exist on the real filesystem, so one bypassed call
  * would fail loudly; (2) artifacts under the local implementation
  * are byte-identical to pre-abstraction expectations via the whole
  * existing maintenance suite (EventLogCompactSpec etc., all green
  * through the routed code). */
class GelFsSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  test("the full store lifecycle runs inside a chroot fake — no call bypasses GelFs") {
    val root = Files.createTempDirectory("gelfsroot").toFile
    val chroot = new ChrootGelFs(root)
    // a VIRTUAL store path: does not exist (and is never created) on
    // the real filesystem — only inside the chroot
    val vdir = "/graft-virtual-store/events"
    EventLog.withFs(chroot) {
      (0 to 2).foreach { d =>
        Seq((d * 10L + 1, d * Day + 1000L, 7L, "a", 5L),
            (d * 10L + 2, d * Day + 2000L, 8L, "b", 6L))
          .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
          .coalesce(1)
          .write.format("graft-eventlog").mode("append").save(vdir)
      }
      assert(spark.read.format("graft-eventlog").load(vdir).count() == 6)
      // maintenance: compact + zorder + merge + DV delete + vacuum
      val st = EventLogCompact.compact(spark, vdir)
      assert(st.groupsMerged >= 0)
      EventLogCompact.compact(spark, vdir, zorder = true)
      val ms = EventLogMerge.upsert(spark, vdir,
        Seq((1L, 1500L, 7L, "a", 99L), (500L, Day + 5L, 9L, "n", 1L))
          .toDF("event_id", "ts_us", "user_id", "event_type", "cents"))
      assert(ms.matched == 1 && ms.inserted == 1, ms.toString)
      val name = s"gelfs_${Integer.toHexString(vdir.hashCode)}"
      GraftCatalog.register(spark, name, vdir)
      spark.sql(s"DELETE FROM graft.$name WHERE ts_us < 1500")
      EventLog.vacuum(vdir, graceMs = 0L)
      val got = spark.read.format("graft-eventlog").load(vdir)
        .select("event_id", "cents").as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 99L, 2L -> 6L, 11L -> 5L, 12L -> 6L,
        21L -> 5L, 22L -> 6L, 500L -> 1L), got.toString)
    }
    assert(chroot.ops.get() > 100,
      s"suspiciously few routed operations: ${chroot.ops.get()}")
    // the virtual path never materialized on the REAL filesystem —
    // the would-be footprint of any bypassing java.io call
    assert(!new java.io.File(vdir).exists(),
      "a bypassing call created the virtual path on the real fs")
    // and the chroot holds a complete store: manifest + data + schema
    val inside = new java.io.File(root, vdir).listFiles().map(_.getName)
    assert(inside.exists(_.endsWith(".gel")))
    assert(inside.exists(EventLog.isManifestFile))
  }

  test("LocalGelFs is byte-identical to direct java.io for the same writes") {
    // same rows written under the default fs and under an explicit
    // LocalGelFs: identical file contents (the abstraction adds no
    // behavior on the local mount)
    val a = Files.createTempDirectory("gelfsa").toString
    val b = Files.createTempDirectory("gelfsb").toString
    def write(dir: String): Unit =
      Seq((1L, 1000L, 7L, "a", 5L), (2L, 2000L, 8L, "b", 6L))
        .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
        .coalesce(1)
        .write.format("graft-eventlog").mode("append").save(dir)
    write(a)
    EventLog.withFs(LocalGelFs) { write(b) }
    def gelBytes(dir: String): Seq[Byte] = {
      val f = EventLog.listFiles(dir).head
      java.nio.file.Files.readAllBytes(f.toPath).toSeq
    }
    assert(gelBytes(a) == gelBytes(b), "artifact bytes diverged")
  }

  test("static guard: no direct filesystem call survives in the v2 package outside GelFs") {
    val dir = new java.io.File("src/main/scala/graft/sources/v2")
    val banned = Seq("new FileInputStream", "new java.io.FileInputStream",
      "new FileOutputStream", "new java.io.FileOutputStream",
      ".renameTo(", ".createNewFile()", "Files.readAllBytes(",
      "Files.write(", "Files.getLastModifiedTime(", ".listFiles()")
    val offenders = dir.listFiles().toSeq
      .filter(f => f.getName.endsWith(".scala") && f.getName != "GelFs.scala")
      .flatMap { f =>
        val src = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        // strip doc comments and line comments before matching
        val code = src.linesIterator
          .filterNot(l => l.trim.startsWith("*") || l.trim.startsWith("//"))
          .mkString("\n")
        banned.filter(code.contains).map(b => s"${f.getName}: $b")
      }
    assert(offenders.isEmpty,
      s"direct IO bypassing GelFs:\n${offenders.mkString("\n")}")
  }
}
