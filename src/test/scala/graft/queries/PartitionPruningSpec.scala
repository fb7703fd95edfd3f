package graft.queries

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Partition pruning end-to-end: a date-partitioned landing zone (the
  * app's layout) must answer single-day queries by reading ONLY that
  * day's files — at 100 TB the difference between a partition-pruned
  * read and a full scan is the whole job. */
class PartitionPruningSpec extends SparkTestBase {
  import spark.implicits._

  test("date filter prunes partitions of the landing layout") {
    val dir = Files.createTempDirectory("pruning").toString
    (1 to 30).flatMap(d => Seq(("2024-03-%02d".format(d), d.toLong, d * 1.5)))
      .toDF("date", "k", "v")
      .write.mode("overwrite").partitionBy("date").parquet(dir)

    val q = spark.read.parquet(dir).where($"date" === "2024-03-07")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(600))
    // collect() executes THIS queryExecution (count() would plan a new one
    // and leave these metrics untouched)
    assert(q.collect().length == 1)
    // post-execution scan metric: exactly ONE of the 30 partition dirs read
    val numFiles = q.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value }
    assert(numFiles.nonEmpty && numFiles.sum == 1,
      s"scan not pruned: read ${numFiles.sum} files")
  }

  test("min/max row-group statistics skip unsorted value ranges on a sorted layout") {
    val dir = Files.createTempDirectory("minmax").toString
    // sorted write → tight per-file min/max → file-level skipping
    spark.range(0, 100000).select($"id", ($"id" % 97).as("payload"))
      .orderBy("id").repartitionByRange(8, $"id")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).where($"id" === 4242L)
    // data filter must be pushed to the reader for stats-based skipping
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,4242)]"),
      plan.take(600))
    assert(q.count() == 1)
  }
}
