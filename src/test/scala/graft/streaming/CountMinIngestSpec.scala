package graft.streaming

import graft.operators.CountMinSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Continuous Count-Min (transformWithState): after every micro-batch
  * the streamed cell totals must equal the batch sketch over the
  * prefix seen so far — including under re-delivery, where counts in
  * exactly-once state must not double. */
class CountMinIngestSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** transformWithState requires the RocksDB provider; scope it to the
    * test so the shared session's other suites keep the default. */
  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private def cellMap(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
    df.groupBy("i", "bucket").agg(max("c").as("c"))
      .as[(Int, Long, Long)].collect()
      .map { case (i, b, c) => (i, b) -> c }.toMap

  test("streamed cell totals equal the batch sketch after every chunk") {
    withRocksDb {
      // three chunks with deliberate key overlap so cells accumulate
      val chunks = Seq(
        (1 to 100).map(i => (i % 13).toLong),
        (1 to 80).map(i => (i % 7).toLong),
        (1 to 60).map(i => (i % 13).toLong))
      val input = MemoryStream[Long](spark)
      val q = CountMinIngest.cells(input.toDS()).writeStream
        .format("memory").queryName("cm_cells")
        .outputMode(OutputMode.Update).start()
      try {
        var prefix = Seq.empty[Long]
        chunks.foreach { c =>
          input.addData(c); q.processAllAvailable()
          prefix = prefix ++ c
          val batch = cellMap(
            CountMinSketch.build(prefix.toDF("user_id"), "user_id"))
          val streamed = cellMap(spark.table("cm_cells"))
          assert(streamed === batch, s"diverged after ${prefix.size} rows")
        }
      } finally q.stop()
    }
  }

  test("estimates from the streamed cells match the batch estimator") {
    withRocksDb {
      val keys = (1 to 400).map(i => (i % 29).toLong)
      val input = MemoryStream[Long](spark)
      val q = CountMinIngest.cells(input.toDS()).writeStream
        .format("memory").queryName("cm_cells2")
        .outputMode(OutputMode.Update).start()
      try {
        input.addData(keys); q.processAllAvailable()
      } finally q.stop()
      val batchDf = keys.toDF("user_id")
      val probe = batchDf.distinct()
      val fromStream = CountMinIngest.estimateFrom(
          spark.table("cm_cells2"), probe, "user_id")
        .select("user_id", "est").as[(Long, Long)].collect().toMap
      val fromBatch = CountMinSketch.estimate(
          CountMinSketch.build(batchDf, "user_id"), probe, "user_id")
        .select("user_id", "est").as[(Long, Long)].collect().toMap
      assert(fromStream === fromBatch)
    }
  }
}
