package graft.sources

import java.nio.file.Files

import graft.sources.v2.{EventLog, EventLogStatsScan}
import org.apache.spark.sql.functions._

/** The graft-eventlog DataSource V2, both directions: the task-commit
  * V2 write (one zone-mapped file per UTC day, temp-and-rename, loud
  * schema/null refusal), wire round-trip, zone-map file skipping under
  * pushed ts/type predicates (counted at planning time), pruned
  * fixed-width decode, and the residual re-filter that makes skipping
  * a pure optimization. */
class EventLogSourceSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L // one UTC day in micros

  // three UTC days: day 0 has types a+b, day 1 only b, day 2 only c
  private val rows = Seq(
    (1L, 10L * 3600 * 1000000L, 100L, "a", 500L),
    (2L, 11L * 3600 * 1000000L, 101L, "b", -250L),
    (3L, Day + 1000L, 102L, "b", 125L),
    (4L, Day + 2000L, 103L, "b", 9999L),
    (5L, 2 * Day + 5000L, 104L, "c", 1L))

  /** V2 write: day-repartitioned so each day lands as one file. */
  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("gel").toString
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .withColumn("__day", expr("ts_us div 86400000000"))
      .repartition(col("__day"))
      .sortWithinPartitions("ts_us", "event_id")
      .drop("__day")
      .write.format("graft-eventlog").mode("append").save(dir)
    dir
  }

  test("V2 write + read round-trip preserves every row and value") {
    val dir = writeFixture()
    assert(EventLog.listFiles(dir).size == 3) // one file per day
    // the task-commit protocol left no in-progress temp files behind
    assert(new java.io.File(dir).listFiles()
      .forall(f => f.getName.endsWith(".gel")))
    val got = spark.read.format("graft-eventlog").load(dir)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(got == rows.toSet)
  }

  test("a second append adds files — never clobbers a previous job's output") {
    val dir = writeFixture()
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .withColumn("__day", expr("ts_us div 86400000000"))
      .repartition(col("__day"))
      .drop("__day")
      .write.format("graft-eventlog").mode("append").save(dir)
    assert(EventLog.listFiles(dir).size == 6) // 3 + 3, none replaced
    // append semantics: every row now present exactly twice
    val counts = spark.read.format("graft-eventlog").load(dir)
      .groupBy("event_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.toSet == Set(2L) && counts.size == rows.size)
  }

  test("job-level abort deletes files its committed tasks renamed into place") {
    val dir = writeFixture()
    val before = EventLog.listFiles(dir).map(_.getName)
    new graft.sources.v2.EventLogBatchWrite(dir).abort(
      Array(graft.sources.v2.EventLogCommit(Seq(before.head)), null))
    assert(EventLog.listFiles(dir).map(_.getName) == before.tail)
  }

  test("write refuses a wrong schema and null fields loudly") {
    val dir = Files.createTempDirectory("gel").toString
    val wrong = intercept[Exception] {
      Seq((1L, "x")).toDF("event_id", "event_type")
        .write.format("graft-eventlog").mode("append").save(dir)
    }
    // Spark's V2 analyzer rejects the mismatch against Table.schema()
    // before the WriteBuilder's own require can — either refusal is loud
    assert(wrong.getMessage.contains("graft-eventlog writes need schema") ||
      wrong.getMessage.contains("INCOMPATIBLE_DATA_FOR_TABLE"),
      wrong.getMessage)
    val withNull = intercept[Exception] {
      Seq((1L, Some(5L), 2L, "a", 3L), (2L, None, 2L, "a", 3L))
        .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
        .write.format("graft-eventlog").mode("append").save(dir)
    }
    // the table schema declares every field non-null, so Spark's own
    // AssertNotNull fires before the writer's guard — loud either way
    assert(withNull.getMessage.contains("no null lane") ||
      withNull.getMessage.contains("NOT_NULL_ASSERT_VIOLATION"),
      withNull.toString)
  }

  test("ts range predicate skips whole files at planning time") {
    val dir = writeFixture()
    val skip0 = EventLog.skippedFiles.get()
    val plan0 = EventLog.plannedFiles.get()
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("ts_us") >= Day) // day 0's file must never be opened
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(got == rows.filter(_._2 >= Day).toSet)
    assert(EventLog.skippedFiles.get() - skip0 == 1)
    assert(EventLog.plannedFiles.get() - plan0 == 2)
  }

  test("event_type equality skips files whose dictionary lacks the type") {
    val dir = writeFixture()
    val skip0 = EventLog.skippedFiles.get()
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("event_type") === "c")
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(5L))
    assert(EventLog.skippedFiles.get() - skip0 == 2) // days 0 and 1
  }

  test("residual re-filter: a cutoff inside a surviving file still drops rows") {
    val dir = writeFixture()
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("ts_us") >= Day + 1500L) // file day-1 survives, row 3 must go
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(4L, 5L))
  }

  test("global count/min/max answer from headers alone — zero record IO") {
    val dir = writeFixture()
    val before = EventLogStatsScan.headerOnlyFiles.get()
    val df = spark.read.format("graft-eventlog").load(dir)
      .agg(count(col("event_id")).as("n"), min("ts_us").as("mn"),
        max("ts_us").as("mx"))
    assert(df.as[(Long, Long, Long)].collect().head ==
      ((5L, rows.map(_._2).min, rows.map(_._2).max)))
    assert(EventLogStatsScan.headerOnlyFiles.get() - before == 3)
  }

  test("an empty store aggregates to count 0 — pushdown refused, never NULL") {
    // partial pushdown rewrites the final COUNT to a SUM over the stats
    // rows; zero files would make that NULL where the plain scan says 0
    val dir = Files.createTempDirectory("gel_empty").toString
    val n = spark.read.format("graft-eventlog").load(dir)
      .agg(count(col("event_id"))).as[Long].collect().head
    assert(n == 0L)
  }

  test("aggregate pushdown is refused when a filter survives — record scan runs") {
    val dir = writeFixture()
    val before = EventLogStatsScan.headerOnlyFiles.get()
    val df = spark.read.format("graft-eventlog").load(dir)
      .where(col("ts_us") >= Day)
      .agg(count(col("event_id")).as("n"), min("ts_us").as("mn"))
    assert(df.as[(Long, Long)].collect().head == ((3L, Day + 1000L)))
    assert(EventLogStatsScan.headerOnlyFiles.get() == before,
      "header stats answered a filtered aggregate — zone maps cannot do that")
  }

  test("batch scans take the vectorized path: ColumnarToRow above the scan") {
    val dir = writeFixture()
    val df = spark.read.format("graft-eventlog").load(dir)
      .select("event_id", "cents")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan)
    assert(df.as[(Long, Long)].collect().toSet ==
      rows.map(r => (r._1, r._5)).toSet)
  }

  test("the row-based fallback reader decodes identically to the columnar path") {
    val dir = writeFixture()
    val day0 = EventLog.listFiles(dir).head // sorted: the day-0 file
    val rdr = new graft.sources.v2.EventLogReaderFactory(
        Array("event_id", "event_type"))
      .createReader(graft.sources.v2.EventLogPartition(day0.getAbsolutePath))
    val got = scala.collection.mutable.Set.empty[(Long, String)]
    while (rdr.next()) {
      val r = rdr.get()
      got += ((r.getLong(0), r.getUTF8String(1).toString))
    }
    rdr.close()
    assert(got == rows.filter(_._2 < Day).map(r => (r._1, r._4)).toSet)
  }

  test("column pruning reaches the reader: 2-column projection decodes 2 fields") {
    val dir = writeFixture()
    val df = spark.read.format("graft-eventlog").load(dir)
      .select("event_type", "cents")
    val got = df.as[(String, Long)].collect().toSet
    assert(got == rows.map(r => (r._4, r._5)).toSet)
    assert(EventLog.lastDecodedFields.get() == 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-eventlog"), plan)
  }
}
