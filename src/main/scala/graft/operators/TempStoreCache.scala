package graft.operators

import org.apache.spark.sql.SparkSession

/** One materialized throwaway store per (session, input dir): repeated
  * bench / verify invocations in one JVM would otherwise write a fresh
  * store into java.io.tmpdir per call and never delete it — the
  * tmpdir-accumulation failure mode of long sweeps (the round-6
  * driver-sweep suspect). The store IS a persisted artifact by design
  * in its queries, so rebuilding it per invocation was the artificial
  * part. All created dirs are removed by one JVM shutdown hook.
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

  /** The store directory for (`prefix`, session, `dir`), building it
    * with `build` exactly once per JVM per key. */
  def getOrCreate(s: SparkSession, dir: String, prefix: String)(
      build: String => Unit): String = {
    cleanup
    stores.computeIfAbsent(
      s"$prefix|${System.identityHashCode(s.sparkContext)}|$dir", _ => {
        val p = java.nio.file.Files.createTempDirectory(prefix).toString
        build(p)
        p
      })
  }
}
