package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** OFFSET pushdown: a bare `.offset(n)` deletes the Offset node and the
  * source skips exactly n rows in its deterministic file order — whole
  * leading files never planned, the boundary file record-seeked. */
class EventLogOffsetSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  /** Three day files in name order: ids (1,2) / (3,4,5) / (6). */
  private def store(): String = {
    val dir = Files.createTempDirectory("geloff").toString
    Seq((1L, 10L, 7L, "a", 100L), (2L, 20L, 8L, "b", 200L),
        (3L, Day + 10L, 7L, "a", 300L), (4L, Day + 20L, 8L, "b", 400L),
        (5L, Day + 30L, 9L, "a", 500L), (6L, 2 * Day + 10L, 9L, "c", 600L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .withColumn("__day", expr("ts_us div 86400000000"))
      .repartition(col("__day")).drop("__day")
      .write.format("graft-eventlog").mode("append").save(dir)
    dir
  }

  private def read(dir: String) =
    spark.read.format("graft-eventlog").load(dir)

  test("offset skips exactly n rows in file order; whole files unplanned") {
    val dir = store()
    val planned0 = EventLog.plannedFiles.get()
    val pruned0 = EventLog.offsetPrunedFiles.get()
    // 3 skips all of file 1 (2 rows) and one record of file 2
    assert(read(dir).offset(3).select("event_id").as[Long].collect().sorted
      .sameElements(Array(4L, 5L, 6L)))
    assert(EventLog.offsetPrunedFiles.get() - pruned0 == 1,
      "the fully-skipped leading file was still planned")
    assert(EventLog.plannedFiles.get() - planned0 == 2)
    // the offset was COMPLETE: no Offset/GlobalLimit trimming needed
    val plan = read(dir).offset(3).queryExecution.executedPlan.toString
    assert(plan.contains("offset=3"), s"offset not pushed:\n$plan")
    assert(!plan.contains("CollectLimit") || !plan.contains("Offset"),
      s"plan kept an Offset above a pushed scan:\n$plan")
  }

  test("offset boundaries: 0, exact file edges, beyond the store") {
    val dir = store()
    assert(read(dir).offset(0).count() == 6)
    assert(read(dir).offset(2).select("event_id").as[Long].collect().sorted
      .sameElements(Array(3L, 4L, 5L, 6L)))
    assert(read(dir).offset(5).select("event_id").as[Long].collect()
      .sameElements(Array(6L)))
    assert(read(dir).offset(6).count() == 0)
    assert(read(dir).offset(100).count() == 0)
  }

  test("offset under a filter is NOT pushed and stays correct") {
    val dir = store()
    // rows with ts >= Day in file order: 3,4,5,6 — offset 2 → 5,6
    val got = read(dir).where(col("ts_us") >= Day).offset(2)
      .select("event_id").as[Long].collect().sorted
    assert(got.sameElements(Array(5L, 6L)))
    val plan = read(dir).where(col("ts_us") >= Day).offset(2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("offset=2"),
      s"a filtered scan must refuse the offset push:\n$plan")
  }

  test("offset composed with limit stays correct (partial limit above)") {
    val dir = store()
    assert(read(dir).offset(2).limit(3).select("event_id").as[Long]
      .collect().sorted.sameElements(Array(3L, 4L, 5L)))
    assert(read(dir).limit(4).offset(2).select("event_id").as[Long]
      .collect().sorted.sameElements(Array(3L, 4L)))
  }

  test("a pushed offset withdraws the runtime-filtering offer") {
    val dir = store()
    val b = new EventLogScanBuilder(dir)
    assert(b.pushOffset(3))
    val scan = b.build().asInstanceOf[EventLogScan]
    assert(scan.filterAttributes().isEmpty,
      "an offset scan offered runtime filtering — join-driven pruning " +
        "would change which rows the deleted Offset node skips")
    val plain = new EventLogScanBuilder(dir).build()
      .asInstanceOf[EventLogScan]
    assert(plain.filterAttributes().nonEmpty)
  }

  test("offset and limit are never co-pushed; views refuse offset") {
    val dir = store()
    val b1 = new EventLogScanBuilder(dir)
    assert(b1.pushLimit(2))
    assert(!b1.pushOffset(1))
    val b2 = new EventLogScanBuilder(dir)
    assert(b2.pushOffset(1))
    assert(!b2.pushLimit(2))
    val b3 = new EventLogScanBuilder(dir, EventLog.OptPred.All,
      EventLog.TimeView.AsOf(1))
    assert(!b3.pushOffset(1))
  }
}
