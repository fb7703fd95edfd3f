package graft.sources.v2

import java.io.{InputStream, OutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The Hadoop `FileSystem`-backed [[GelFs]] — the cluster
  * implementation the contract doc names ([[GelFs]]): HDFS and every
  * store a Hadoop client can mount become valid eventlog homes with
  * no change anywhere else in the v2 package (the twelve methods are
  * the whole surface). Store paths stay `java.io.File` PATH VALUES;
  * they map 1:1 onto Hadoop `Path`s and resolve against the
  * configuration's `fs.defaultFS` (plain absolute paths land on HDFS
  * in a cluster, on `file://` offline — which is exactly how this is
  * CI-tested without a namenode).
  *
  * Contract notes:
  *  - [[rename]] maps to `FileSystem.rename` — atomic within a
  *    directory on HDFS (namenode op) and on POSIX-backed local fs.
  *  - [[createNew]] maps to `create(path, overwrite = false)` —
  *    atomic-exclusive on HDFS (the namenode arbitrates one winner);
  *    on Hadoop's LOCAL filesystem the exists-check+create pair is
  *    only best-effort exclusive, the usual Hadoop caveat (the
  *    offline spec asserts the CONTRACT — second claim returns false
  *    — which both give).
  *  - The checksummed `LocalFileSystem` is unwrapped to its RAW form:
  *    `.crc` sidecars would pollute [[listFiles]] (vacuum, zone-map
  *    listings) and break byte-identity with [[LocalGelFs]] stores.
  *  - [[mtimeNanos]] is millisecond-derived (Hadoop surfaces ms);
  *    its one consumer treats it as an opaque monotone-enough stamp.
  *
  * The companion `object HadoopGelFs` is the default-configuration
  * instance, loadable BY NAME through [[EventLog.FsImplConfKey]] —
  * `--conf spark.graft.eventlog.fs.impl=graft.sources.v2.HadoopGelFs`
  * resolves it on driver and every executor. */
class HadoopGelFs(confOf: () => Configuration) extends GelFs {

  @transient private lazy val conf = confOf()

  private def p(f: java.io.File): Path = new Path(f.getPath)

  private def fsOf(path: Path): FileSystem = path.getFileSystem(conf) match {
    case c: org.apache.hadoop.fs.LocalFileSystem => c.getRaw
    case other => other
  }

  private def statusOf(f: java.io.File)
      : Option[org.apache.hadoop.fs.FileStatus] = {
    val path = p(f)
    try Some(fsOf(path).getFileStatus(path))
    catch { case _: java.io.FileNotFoundException => None }
  }

  override def mkdirs(dir: java.io.File): Unit = {
    fsOf(p(dir)).mkdirs(p(dir)); ()
  }

  override def listFiles(dir: java.io.File): Seq[java.io.File] = {
    val path = p(dir)
    try fsOf(path).listStatus(path).toSeq
      .map(st => new java.io.File(dir, st.getPath.getName))
    catch { case _: java.io.FileNotFoundException => Nil }
  }

  override def isFile(f: java.io.File): Boolean =
    statusOf(f).exists(_.isFile)

  override def isDirectory(f: java.io.File): Boolean =
    statusOf(f).exists(_.isDirectory)

  override def length(f: java.io.File): Long =
    statusOf(f).map(_.getLen).getOrElse(0L)

  override def lastModified(f: java.io.File): Long =
    statusOf(f).map(_.getModificationTime).getOrElse(0L)

  override def mtimeNanos(f: java.io.File): Long =
    lastModified(f) * 1000000L

  override def openRead(f: java.io.File): InputStream =
    fsOf(p(f)).open(p(f))

  override def openWrite(f: java.io.File): OutputStream =
    fsOf(p(f)).create(p(f), true)

  override def rename(src: java.io.File, dst: java.io.File): Boolean =
    try fsOf(p(src)).rename(p(src), p(dst))
    catch { case _: java.io.IOException => false }

  override def delete(f: java.io.File): Boolean =
    try fsOf(p(f)).delete(p(f), false)
    catch { case _: java.io.IOException => false }

  override def createNew(f: java.io.File): Boolean =
    try { fsOf(p(f)).create(p(f), false).close(); true }
    catch { case _: java.io.IOException => false }

  override def touch(f: java.io.File): Unit =
    try fsOf(p(f)).setTimes(p(f), System.currentTimeMillis(), -1L)
    catch { case _: java.io.FileNotFoundException => () }

  override def readAll(f: java.io.File): Array[Byte] = {
    val in = openRead(f)
    try in.readAllBytes() finally in.close()
  }
}

/** Default-configuration instance (classpath `fs.defaultFS`; plain
  * `file:///` offline) — the name a spark-submit conf points at. */
object HadoopGelFs extends HadoopGelFs(() => new Configuration())
