package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** State-store provider parity: the same flatMapGroupsWithState twin
  * run under BOTH the default HDFS-backed provider and RocksDB must
  * emit bit-identical output. WHY: production wiring (graft.app.Main)
  * selects RocksDB to keep streaming state off-heap, but the
  * flatMapGroupsWithState twins' specs all run the default provider —
  * a state (de)serialization or config drift that only RocksDB trips
  * (its state round-trips through binary encoders every micro-batch
  * instead of living on-heap) would pass every existing spec and fail
  * first in production. The transformWithState twins already REQUIRE
  * RocksDB (CountMinIngestSpec etc.), so this closes the inverse gap
  * for the GroupState family.
  *
  * Batch boundaries are pinned (one addData + processAllAvailable per
  * chunk), so Update-mode emissions are deterministic and the full
  * sink contents — every per-batch re-emission, not just the final
  * state — must match as a multiset. */
class StateStoreProviderSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Hdfs =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  private def withProvider[T](provider: String)(body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, provider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private def multiset[T](rows: Seq[T]): Map[T, Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  /** Three chunks with cross-chunk group overlap and re-streamed items —
    * state must merge, not reset, so a provider that loses or corrupts
    * a round-trip shows up as a diverged sample. */
  private val chunks = Seq(
    (1 to 40).map(i => BottomKSample.Item(s"g${i % 3}", i.toLong)),
    (20 to 60).map(i => BottomKSample.Item(s"g${i % 3}", i.toLong)),
    (1 to 15).map(i => BottomKSample.Item(s"g${i % 4}", (i * 7).toLong)))

  test("BottomKSample under RocksDB equals the default provider bit-for-bit") {
    def run(provider: String): Map[(String, Long, Int), Int] =
      withProvider(provider) {
        val input = MemoryStream[BottomKSample.Item](spark)
        val name = s"ssp_${provider.hashCode.abs}_${System.nanoTime()}"
        val q = BottomKSample.sample(input.toDS(), k = 8).writeStream
          .format("memory").queryName(name)
          .outputMode(OutputMode.Update).start()
        try {
          chunks.foreach { c => input.addData(c); q.processAllAvailable() }
          multiset(spark.table(name)
            .as[(String, Long, Int)].collect().toSeq)
        } finally q.stop()
      }
    val hdfs = run(Hdfs)
    val rocks = run(RocksDb)
    assert(hdfs == rocks,
      s"provider drift: hdfs-only=${hdfs.keySet -- rocks.keySet}, " +
        s"rocks-only=${rocks.keySet -- hdfs.keySet}")
    assert(hdfs.nonEmpty)
  }

  test("the weighted sampler's state survives a RocksDB round-trip identically") {
    def run(provider: String): Map[(String, Long, Long, Int), Int] =
      withProvider(provider) {
        val input = MemoryStream[WeightedBottomK.WItem](spark)
        val name = s"sspw_${provider.hashCode.abs}_${System.nanoTime()}"
        val q = WeightedBottomK.sample(input.toDS(), k = 4).writeStream
          .format("memory").queryName(name)
          .outputMode(OutputMode.Update).start()
        try {
          input.addData((1 to 30).map(i =>
            WeightedBottomK.WItem(s"g${i % 2}", i.toLong, (i % 5 + 1).toLong)))
          q.processAllAvailable()
          // re-stream half the items with CHANGED weights: last-write-wins
          // re-keying is exactly the state mutation a provider must persist
          input.addData((1 to 15).map(i =>
            WeightedBottomK.WItem(s"g${i % 2}", i.toLong, (i % 3 + 1).toLong)))
          q.processAllAvailable()
          multiset(spark.table(name)
            .as[(String, Long, Long, Int)].collect().toSeq)
        } finally q.stop()
      }
    assert(run(Hdfs) == run(RocksDb))
  }
}
