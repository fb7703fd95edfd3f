package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ConstraintMonitorSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val rules = Seq(
    ConstraintMonitor.Rule("text_present",
      col("text").isNull || length(col("text")) === 0),
    ConstraintMonitor.Rule("id_positive", col("doc_id") <= 0))

  test("per-epoch reports carry exact violation counts that sum to the truth") {
    val dir = Files.createTempDirectory("constraint_monitor").toString
    val input = MemoryStream[CrawlDoc](spark)
    val q = ConstraintMonitor.start(input.toDF(), rules,
      s"$dir/reports", s"$dir/ckpt")
    try {
      input.addData(Seq(
        CrawlDoc(1L, "fine"), CrawlDoc(2L, ""), CrawlDoc(-3L, "fine")))
      q.processAllAvailable()
      input.addData(Seq(CrawlDoc(4L, "fine"), CrawlDoc(-5L, "")))
      q.processAllAvailable()
    } finally q.stop()

    val reports = spark.read.parquet(s"$dir/reports").cache()
    // epoch 0: one empty text, one non-positive id; epoch 1: one of each
    val perEpoch = reports
      .select("__batch", "rule", "violations", "rows_scanned", "pass")
      .as[(Long, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(perEpoch((0L, "text_present")) == ((1L, 3L, false)))
    assert(perEpoch((0L, "id_positive")) == ((1L, 3L, false)))
    assert(perEpoch((1L, "text_present")) == ((1L, 2L, false)))
    assert(perEpoch((1L, "id_positive")) == ((1L, 2L, false)))
    // increments SUM to the all-time audit without any data rescan
    val total = reports.groupBy("rule")
      .agg(sum("violations").as("v"), sum("rows_scanned").as("n"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(total == Map("text_present" -> ((2L, 5L)), "id_positive" -> ((2L, 5L))))

    // the batch battery shape agrees with the streaming reports: same
    // rules over the union of both batches
    val all = Seq((1L, "fine"), (2L, ""), (-3L, "fine"), (4L, "fine"), (-5L, ""))
      .toDF("doc_id", "text")
    val batch = ConstraintMonitor.report(all, rules)
      .select("rule", "violations", "pass")
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(batch("text_present") == (("text_present", 2L, false)))
    assert(batch("id_positive") == (("id_positive", 2L, false)))
  }

  test("an empty epoch reports zero violations and passes, never nulls") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = ConstraintMonitor.report(empty, rules)
      .select("rule", "violations", "rows_scanned", "pass")
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.length == 2)
    assert(out.forall(r => r._2 == 0L && r._3 == 0L && r._4),
      s"empty epoch mis-reported: ${out.toSeq}")
  }
}
