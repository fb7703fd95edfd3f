package graft.sources.v2

import java.io.{InputStream, OutputStream}

/** THE STORE'S FILESYSTEM CONTRACT (round 11) — the minimal set of
  * operations every eventlog component (planning, maintenance,
  * manifest log, sidecars, the commit lock) performs against the
  * store directory. `java.io.File` here is a PURE PATH VALUE — a
  * typed string, exactly like Hadoop's `Path` — and the only code
  * allowed to touch the real filesystem behind it is a [[GelFs]]
  * implementation. That inversion is what makes the maintenance path
  * cluster-mountable: [[LocalGelFs]] is the POSIX/local-mount
  * implementation (byte-identical to the pre-abstraction behavior); a
  * Hadoop `FileSystem`-backed implementation needs only these twelve
  * methods (open/create/list/rename/delete/stat — all of which HDFS
  * and object stores with a rename primitive provide); and the spec
  * fake ([[graft.sources.v2.ChrootGelFs]] in the test tree) remaps
  * paths under a chroot and counts calls, proving nothing in the v2
  * package bypasses the interface.
  *
  * Atomicity contract: [[rename]] is the commit primitive everywhere
  * (manifest segments, checkpoint, data files, sidecars) and MUST be
  * atomic within the store directory; [[createNew]] is the
  * cross-process lock claim and MUST be atomic-exclusive. POSIX gives
  * both; HDFS gives both; eventually-consistent object stores without
  * atomic rename are NOT valid store homes (the same contract Delta
  * states for its log).
  *
  * Executor visibility (VERIFIED since round 12, no longer a trust
  * contract): Spark tasks resolve the fs at RUN time in their own JVM
  * — first from the launch conf `spark.graft.eventlog.fs.impl`
  * ([[EventLog.FsImplConfKey]], which Spark propagates to every
  * executor), falling back to the process-installed [[EventLog.fs]]
  * (local mode shares the JVM and needs nothing). And because
  * resolution can still be misconfigured, every maintenance op that
  * writes from tasks carries a PROBE: the driver drops a token file
  * into the store through its fs and each task must see it through
  * the fs it resolved before writing a byte
  * ([[EventLog.taskFsCheck]]) — an executor that would have scattered
  * sidecars or merge outputs onto its local disk refuses loudly
  * instead. */
trait GelFs {
  def mkdirs(dir: java.io.File): Unit
  /** Children of `dir` as path values; empty when absent. */
  def listFiles(dir: java.io.File): Seq[java.io.File]
  def isFile(f: java.io.File): Boolean
  def isDirectory(f: java.io.File): Boolean
  def length(f: java.io.File): Long
  def lastModified(f: java.io.File): Long
  def mtimeNanos(f: java.io.File): Long
  def openRead(f: java.io.File): InputStream
  def openWrite(f: java.io.File): OutputStream
  /** Atomic same-directory rename; false on failure. */
  def rename(src: java.io.File, dst: java.io.File): Boolean
  def delete(f: java.io.File): Boolean
  /** Atomic create-if-absent — the lock primitive. */
  def createNew(f: java.io.File): Boolean
  /** Refresh `f`'s mtime to now — the lock HEARTBEAT (a long fold
    * under the commit lock must keep looking alive to the
    * stale-breaker). */
  def touch(f: java.io.File): Unit
  def readAll(f: java.io.File): Array[Byte]
  final def writeAll(f: java.io.File, bytes: Array[Byte]): Unit = {
    val o = openWrite(f)
    try o.write(bytes) finally o.close()
  }
}

/** The local-mount implementation — plain `java.io` semantics, the
  * store's behavior before the abstraction existed. */
object LocalGelFs extends GelFs {
  override def mkdirs(dir: java.io.File): Unit = { dir.mkdirs(); () }
  override def listFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
  override def isFile(f: java.io.File): Boolean = f.isFile
  override def isDirectory(f: java.io.File): Boolean = f.isDirectory
  override def length(f: java.io.File): Long = f.length()
  override def lastModified(f: java.io.File): Long = f.lastModified()
  override def mtimeNanos(f: java.io.File): Long =
    java.nio.file.Files.getLastModifiedTime(f.toPath)
      .to(java.util.concurrent.TimeUnit.NANOSECONDS)
  override def openRead(f: java.io.File): InputStream =
    new java.io.FileInputStream(f)
  override def openWrite(f: java.io.File): OutputStream =
    new java.io.FileOutputStream(f)
  override def rename(src: java.io.File, dst: java.io.File): Boolean =
    src.renameTo(dst)
  override def delete(f: java.io.File): Boolean = f.delete()
  override def createNew(f: java.io.File): Boolean =
    try f.createNewFile() catch { case _: java.io.IOException => false }
  override def touch(f: java.io.File): Unit = {
    f.setLastModified(System.currentTimeMillis()); ()
  }
  override def readAll(f: java.io.File): Array[Byte] =
    java.nio.file.Files.readAllBytes(f.toPath)
}
