package graft.streaming

import graft.queries.SeriesStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Continuous skew/kurtosis (transformWithState): after every
  * micro-batch each type's emitted shape must be BIT-IDENTICAL to
  * batch q235 over the prefix seen so far — integer power sums
  * commute, so there is no tolerance anywhere. */
class MomentsMonitorSpec extends graft.SparkTestBase {
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

  private def batchShape(prefix: Seq[(String, Long)])
      : Map[String, (Long, Option[Long], Option[Long])] =
    SeriesStats.momentsOn(prefix.toDF("g", "c")).collect()
      .map { r =>
        r.getString(0) -> ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
      }.toMap

  test("streamed shape equals batch q235 bit-for-bit after every chunk") {
    withRocksDb {
      val chunks = Seq(
        Seq(("a", 0L), ("a", 0L), ("a", 0L), ("b", -1L), ("b", 0L)),
        Seq(("a", 1L), ("b", 0L), ("b", 1L)),
        Seq(("a", 500L), ("b", -7L), ("b", 7L))) // heavy outlier lands
      val input = MemoryStream[(String, Long)](spark)
      val q = MomentsMonitor.monitor(input.toDS()).writeStream
        .format("memory").queryName("moments_m")
        .outputMode(OutputMode.Update).start()
      try {
        var prefix = Seq.empty[(String, Long)]
        chunks.zipWithIndex.foreach { case (c, ci) =>
          input.addData(c)
          q.processAllAvailable()
          prefix = prefix ++ c
          val batch = batchShape(prefix)
          val streamed = spark.table("moments_m")
            .withColumn("seq", monotonically_increasing_id())
            .as[(String, Long, Option[Long], Option[Long], Long)]
            .collect().groupBy(_._1)
            .map { case (t, rs) =>
              val r = rs.maxBy(_._5); t -> ((r._2, r._3, r._4))
            }
          assert(streamed === batch, s"diverged after chunk $ci")
        }
      } finally q.stop()
    }
  }

  test("a constant type emits None shape until variance appears") {
    withRocksDb {
      val input = MemoryStream[(String, Long)](spark)
      val q = MomentsMonitor.monitor(input.toDS()).writeStream
        .format("memory").queryName("moments_c")
        .outputMode(OutputMode.Update).start()
      try {
        input.addData(Seq(("k", 7L), ("k", 7L)))
        q.processAllAvailable()
        val first = spark.table("moments_c")
          .as[(String, Long, Option[Long], Option[Long])].collect().head
        assert(first === (("k", 2L, None, None)))
        input.addData(Seq(("k", 8L)))
        q.processAllAvailable()
        val rows = spark.table("moments_c")
          .as[(String, Long, Option[Long], Option[Long])].collect()
        assert(rows.exists(r => r._2 == 3L && r._3.isDefined))
      } finally q.stop()
    }
  }
}
