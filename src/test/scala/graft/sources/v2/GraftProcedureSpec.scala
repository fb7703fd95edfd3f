package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The SQL `CALL` surface ([[GraftProcedures]] via [[GraftCatalog]]'s
  * `ProcedureCatalog`): compact / zorder / vacuum / build_blooms driven
  * end-to-end through `spark.sql("CALL graft.…")`, summary result rows,
  * named and defaulted arguments, and the loud refusals (unknown
  * procedure, unregistered store). */
class GraftProcedureSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  private val rows = (1 to 60).map { i =>
    (i.toLong, (i % 3) * Day + i * 1000L, 100L + i % 7,
      if (i % 2 == 0) "a" else "b", i * 10L)
  }

  /** Fragmented store registered as `graft.<name>`. */
  private def registered(): (String, String) = {
    val dir = Files.createTempDirectory("gelp").toString
    (0 until 3).foreach { k =>
      rows.filter(_._3 % 3 == k)
        .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
        .withColumn("__day", expr("ts_us div 86400000000"))
        .repartition(col("__day"))
        .drop("__day")
        .write.format("graft-eventlog").mode("append").save(dir)
    }
    val name = s"proc_${Integer.toHexString(dir.hashCode)}"
    GraftCatalog.register(spark, name, dir)
    (name, dir)
  }

  private def contents(dir: String): Set[(Long, Long, Long, String, Long)] =
    spark.read.format("graft-eventlog").load(dir)
      .as[(Long, Long, Long, String, Long)].collect().toSet

  test("CALL graft.compact merges the store and reports the swap") {
    val (name, dir) = registered()
    val before = EventLog.listFiles(dir).size
    assert(before > 3)
    val row = spark.sql(s"CALL graft.compact('$name')").collect().head
    assert(row.getInt(0) == before, "files_before wrong")
    assert(row.getInt(1) == 3, "files_after: expected one file per day")
    assert(row.getInt(2) == 3 && row.getInt(3) == 0, row.toString)
    assert(contents(dir) == rows.toSet)
  }

  test("CALL graft.compact with zorder and a chunk size re-clusters") {
    val (name, dir) = registered()
    spark.sql(s"CALL graft.compact('$name', true, 10)").collect()
    assert(EventLog.listFiles(dir).size == 6, "expected 2 chunks per day")
    assert(contents(dir) == rows.toSet)
    assert(EventLog.readManifest(dir).values.forall(_.userBounds.isDefined))
    // named-argument form resolves too
    val (name2, _) = registered()
    spark.sql(
      s"CALL graft.compact(store => '$name2', zorder => true)").collect()
  }

  test("CALL graft.vacuum sweeps old orphans and reports the count") {
    val (name, dir) = registered()
    val orphan = new java.io.File(dir, ".inprogress.compact.dead")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    orphan.setLastModified(System.currentTimeMillis() - 100000)
    val swept = spark.sql(s"CALL graft.vacuum('$name', 0)")
      .collect().head.getInt(0)
    assert(swept == 1 && !orphan.exists)
  }

  test("CALL graft.build_blooms writes sidecars; a second call is a no-op") {
    val (name, dir) = registered()
    val built = spark.sql(s"CALL graft.build_blooms('$name')")
      .collect().head.getInt(0)
    assert(built == EventLog.listFiles(dir).size)
    assert(spark.sql(s"CALL graft.build_blooms('$name')")
      .collect().head.getInt(0) == 0)
  }

  test("unknown procedures and unregistered stores refuse loudly") {
    registered() // installs the catalog conf
    val e = intercept[Exception] {
      spark.sql("CALL graft.optimize('x')").collect()
    }
    assert(e.getMessage.contains("optimize") ||
      e.getMessage.toLowerCase.contains("procedure"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("CALL graft.compact('never_registered')").collect()
    }
    def deepMsg(t: Throwable): String =
      Option(t.getCause).map(c => t.getMessage + deepMsg(c))
        .getOrElse(t.getMessage)
    assert(deepMsg(e2).contains("never_registered"), deepMsg(e2))
  }
}
