package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact distinct: after every micro-batch each key's
  * emitted count equals batch count_distinct over the prefix —
  * exactly, including replayed/duplicated ids. */
class BitmapDistinctSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  test("streamed exact distinct equals the batch prefix after every chunk") {
    withRocksDb {
      val chunks = Seq(
        Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 7L)),
        Seq(("a", 2L), ("a", 3L), ("b", 7L), ("b", 8L)), // replays id 2/7
        Seq(("a", 100L), ("b", 9L), ("b", 9L)))
      val input = MemoryStream[(String, Long)](spark)
      val q = BitmapDistinct.distinct(input.toDS()).writeStream
        .format("memory").queryName("bm_distinct")
        .outputMode(OutputMode.Update).start()
      try {
        var prefix = Seq.empty[(String, Long)]
        chunks.zipWithIndex.foreach { case (c, ci) =>
          input.addData(c)
          q.processAllAvailable()
          prefix = prefix ++ c
          val batch = prefix.groupBy(_._1).map { case (k, rs) =>
            k -> rs.map(_._2).distinct.length.toLong
          }
          val streamed = spark.table("bm_distinct")
            .withColumn("seq", monotonically_increasing_id())
            .as[(String, Long, Long)]
            .collect().groupBy(_._1)
            .map { case (k, rs) => k -> rs.maxBy(_._3)._2 }
          assert(streamed == batch, s"diverged after chunk $ci")
        }
      } finally q.stop()
    }
  }
}
