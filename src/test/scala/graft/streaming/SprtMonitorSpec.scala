package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** SPRT monitor: pooled (n, k) after every chunk must equal the batch
  * prefix counts under any sharding, and the read-out must apply the
  * same frozen micro-nat constants as batch q272. */
class SprtMonitorSpec extends graft.SparkTestBase {
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

  test("pooled counts and LLR equal the batch prefix after every chunk") {
    withRocksDb {
      val chunks = Seq(
        (1L to 40L).map(i => (i, i % 5 == 0)),
        (41L to 90L).map(i => (i, i % 3 == 0)),
        (91L to 120L).map(i => (i, i % 2 == 0)))
      val input = MemoryStream[(Long, Boolean)](spark)
      val q = SprtMonitor.stats(input.toDS(), shards = 4).writeStream
        .format("memory").queryName("sprt_stats")
        .outputMode(OutputMode.Update).start()
      try {
        var prefix = Seq.empty[(Long, Boolean)]
        for (chunk <- chunks) {
          prefix ++= chunk
          input.addData(chunk: _*)
          q.processAllAvailable()
          val latest = spark.table("sprt_stats")
            .as[SprtShardRow].collect().zipWithIndex
            .groupBy(_._1.shard)
            .map { case (_, rs) => rs.maxBy(_._2)._1 }.toSeq
          val (n, k, llr, dec) = SprtMonitor.decide(latest)
          val wantN = prefix.size.toLong
          val wantK = prefix.count(_._2).toLong
          assert(n == wantN && k == wantK, s"counts: ($n,$k) vs ($wantN,$wantK)")
          val R = graft.queries.Robust
          assert(llr == wantK * R.SprtLaMicro + (wantN - wantK) * R.SprtLbMicro)
          val want =
            if (llr >= R.SprtBoundMicro) "accept_h1"
            else if (llr <= -R.SprtBoundMicro) "accept_h0"
            else "continue"
          assert(dec == want)
        }
        // the constructed stream ends success-heavy enough to decide:
        // 120 trials, 8+17+15=40 successes → LLR ≫ the ±2.944 bound
        val finalRows = spark.table("sprt_stats")
          .as[SprtShardRow].collect().zipWithIndex
          .groupBy(_._1.shard)
          .map { case (_, rs) => rs.maxBy(_._2)._1 }.toSeq
        assert(SprtMonitor.decide(finalRows)._4 == "accept_h1")
      } finally q.stop()
    }
  }
}
