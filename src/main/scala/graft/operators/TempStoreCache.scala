package graft.operators

import org.apache.spark.sql.SparkSession

/** One materialized throwaway store per (session, input dir, input
  * CONTENT): repeated bench / verify invocations in one JVM would
  * otherwise write a fresh store into java.io.tmpdir per call and never
  * delete it — the tmpdir-accumulation failure mode of long sweeps (the
  * round-6 driver-sweep suspect). The store IS a persisted artifact by
  * design in its queries, so rebuilding it per invocation was the
  * artificial part. All created dirs are removed by one JVM shutdown
  * hook.
  *
  * The key folds in a cheap content fingerprint of the input dir
  * (name + length + mtime of every file, recursively): if the parquet
  * under `dir` is REGENERATED within one JVM (the r5
  * testdata-regeneration scenario), the stale store is not served — a
  * fresh one is built for the new content and the old one stays
  * registered for shutdown cleanup.
  *
  * Shared by the q245/q246 bitmap store and the q281 eventlog store —
  * one cache implementation, one cleanup walk, one key scheme. */
object TempStoreCache {

  private val stores =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private lazy val cleanup: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      stores.values.forEach { p =>
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(p)
        if (java.nio.file.Files.exists(root))
          java.nio.file.Files.walk(root).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(java.nio.file.Files.deleteIfExists(_))
      }))

  /** Order-independent fingerprint of everything under `dir`: per-file
    * hashes are SORTED, then folded with a non-commutative mix — an XOR
    * fold would let two identical (path, size, mtime) contributions
    * cancel to zero and a pairwise swap pass unseen; sorting buys walk-
    * order independence without commutativity. Local-FS listing only —
    * microseconds against the store-build it gates. */
  private def fingerprint(dir: String): Long = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) return 0L
    val walk = java.nio.file.Files.walk(root)
    try walk.iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map { p =>
        (root.relativize(p).toString.hashCode.toLong * 1000003L) ^
          (java.nio.file.Files.size(p) * 31L) ^
          // nanosecond mtimes: a same-size regeneration landing inside
          // one milli tick must still change the key
          java.nio.file.Files.getLastModifiedTime(p)
            .to(java.util.concurrent.TimeUnit.NANOSECONDS)
      }
      .toSeq.sorted
      .foldLeft(1469598103934665603L) { (acc, h) => // FNV-ish chain
        (acc ^ h) * -7046029254386353131L // Murmur3 finalizer constant
      }
    finally walk.close()
  }

  /** The store directory for (`prefix`, session, `dir`, content
    * fingerprint), building it with `build` exactly once per JVM per
    * key. A failed build deletes its partial temp directory before
    * rethrowing — no mapping is inserted and nothing orphans. */
  def getOrCreate(s: SparkSession, dir: String, prefix: String)(
      build: String => Unit): String = {
    cleanup
    val key = s"$prefix|${System.identityHashCode(s.sparkContext)}|$dir" +
      s"|${fingerprint(dir)}"
    stores.computeIfAbsent(key, _ => {
      val p = java.nio.file.Files.createTempDirectory(prefix)
      try build(p.toString)
      catch {
        case e: Throwable =>
          import scala.jdk.CollectionConverters._
          if (java.nio.file.Files.exists(p))
            java.nio.file.Files.walk(p).iterator().asScala.toSeq
              .sortBy(-_.getNameCount)
              .foreach(java.nio.file.Files.deleteIfExists(_))
          throw e
      }
      p.toString
    })
  }
}
