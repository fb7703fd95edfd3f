package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Continuous A/B monitor: pooled stats after every chunk must equal a
  * driver replica computed from the prefix's per-user totals — users
  * re-touched across chunks must move Σt/Σt² exactly, never
  * double-count. Arm draw must match the batch md5 contract. */
class AbMonitorSpec extends graft.SparkTestBase {
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

  private def replica(prefix: Seq[(Long, Long)]): Map[(Int, Long, Long, Long), Long] = {
    val totals = prefix.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sum }
    totals.groupBy { case (u, _) => AbMonitor.armOf(u) }
      .map { case (arm, us) =>
        val ts = us.values.toSeq
        (arm, ts.size.toLong, ts.sum, ts.map(t => t * t).sum) -> 1L
      }
  }

  test("pooled stats equal the per-user-total replica after every chunk") {
    withRocksDb {
      val chunks = Seq(
        Seq((1L, 100L), (2L, 250L), (3L, 40L), (1L, 60L)),
        Seq((4L, 500L), (2L, 50L), (5L, 10L), (6L, 70L)),
        Seq((1L, 1L), (7L, 999L), (3L, 3L), (8L, 80L), (9L, 15L)))
      val input = MemoryStream[(Long, Long)](spark)
      val q = AbMonitor.stats(input.toDS(), shards = 4).writeStream
        .format("memory").queryName("ab_stats")
        .outputMode(OutputMode.Update).start()
      try {
        var prefix = Seq.empty[(Long, Long)]
        for (chunk <- chunks) {
          prefix ++= chunk
          input.addData(chunk: _*)
          q.processAllAvailable()
          // latest row per (shard, arm)
          val latest = spark.table("ab_stats")
            .as[AbShardRow].collect()
            .zipWithIndex
            .groupBy(r => (r._1.shard, r._1.arm))
            .map { case (_, rs) => rs.maxBy(_._2)._1 }.toSeq
          val pooled = latest.groupBy(_.arm).map { case (arm, rs) =>
            (arm, rs.map(_.n_users).sum, rs.map(_.sum_cents).sum,
              rs.map(_.sumsq_cents).sum) -> 1L
          }
          assert(pooled == replica(prefix),
            s"pooled $pooled != replica ${replica(prefix)} after ${prefix.size} rows")
        }
        // final z matches the closed-form formula on the replica stats
        val latest = spark.table("ab_stats").as[AbShardRow].collect()
          .zipWithIndex.groupBy(r => (r._1.shard, r._1.arm))
          .map { case (_, rs) => rs.maxBy(_._2)._1 }.toSeq
        val z = AbMonitor.zMilli(latest)
        assert(z.isDefined)
        val totals = prefix.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sum }
        val byArm = totals.groupBy { case (u, _) => AbMonitor.armOf(u) }
          .map { case (a, us) => a -> us.values.toSeq }
        def mv(ts: Seq[Long]): (Long, Double) = {
          val n = ts.size
          val m = ts.sum / n
          val v = (n.toLong * ts.map(t => t * t).sum - ts.sum * ts.sum).toDouble /
            (n.toLong * (n - 1))
          (m, v)
        }
        val (m0, v0) = mv(byArm(0)); val (m1, v1) = mv(byArm(1))
        val zExp = math.round((m1 - m0).toDouble /
          math.sqrt(v0 / byArm(0).size + v1 / byArm(1).size) * 1000.0)
        assert(z.get._6 == zExp)
        assert(z.get._3 == m0 && z.get._4 == m1)
      } finally q.stop()
    }
  }

  test("arm draw matches the batch hashMod contract") {
    val df = spark.range(0, 200).toDF("user_id")
      .selectExpr("user_id",
        "cast(pmod(conv(substring(md5(concat('exp:', cast(user_id as string))), 1, 8), 16, 10), 2) as int) as arm")
    val batch = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 200L).foreach { u =>
      assert(AbMonitor.armOf(u) == batch(u), s"arm mismatch for user $u")
    }
  }

  test("zMilli is None until both arms have two users") {
    assert(AbMonitor.zMilli(Seq(AbShardRow(0, 0, 1, 100, 10000))) == None)
    assert(AbMonitor.zMilli(Seq(
      AbShardRow(0, 0, 2, 300, 50000),
      AbShardRow(0, 1, 1, 100, 10000))) == None)
  }
}
