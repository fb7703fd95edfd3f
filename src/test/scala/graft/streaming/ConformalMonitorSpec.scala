package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Conformal coverage monitor: per-type violation counts after every
  * chunk must equal a driver replica over the prefix (exactness across
  * re-keyed micro-batches), the uncalibrated-type rule must count as
  * violation, and the alarm must fire exactly when the rate crosses
  * the threshold — including under an injected distribution shift. */
class ConformalMonitorSpec extends graft.SparkTestBase {
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

  // interval a: 100 ± 20 ; interval b: 500 ± 50
  private val model = Map("a" -> (100L, 20L), "b" -> (500L, 50L))

  private def replica(prefix: Seq[(String, Long)]): Map[String, (Long, Long)] =
    prefix.groupBy(_._1).map { case (t, xs) =>
      val viol = xs.count { case (_, c) =>
        model.get(t) match {
          case Some((y, q)) => math.abs(c - y) > q
          case None         => true
        }
      }
      t -> (xs.size.toLong, viol.toLong)
    }

  private def latest(table: String): Map[String, ConformalRow] =
    spark.table(table).as[ConformalRow].collect()
      .zipWithIndex.groupBy(_._1.event_type)
      .map { case (t, rs) => t -> rs.maxBy(_._2)._1 }

  test("per-type stats equal the prefix replica; unknown types violate") {
    withRocksDb {
      val chunks = Seq(
        Seq(("a", 110L), ("a", 130L), ("b", 460L), ("zz", 1L)),
        Seq(("a", 95L), ("b", 700L), ("b", 545L), ("zz", 2L)),
        Seq(("a", 115L), ("a", 80L), ("b", 500L)))
      val input = MemoryStream[(String, Long)](spark)
      val q = ConformalMonitor.monitor(input.toDS(), model).writeStream
        .format("memory").queryName("conf_mon")
        .outputMode(OutputMode.Update).start()
      try {
        var prefix = Seq.empty[(String, Long)]
        for (chunk <- chunks) {
          prefix ++= chunk
          input.addData(chunk: _*)
          q.processAllAvailable()
          val got = latest("conf_mon").map { case (t, r) => t -> (r.n, r.violations) }
          assert(got == replica(prefix),
            s"got $got != replica ${replica(prefix)} after ${prefix.size} rows")
        }
        val fin = latest("conf_mon")
        // a: violations |130-100|>20 and |80-100|=20 not -> 1 of 5
        assert(fin("a").n == 5L && fin("a").violations == 1L)
        assert(fin("a").viol_ppm == 200000L && !fin("a").alarm) // > is strict
        // zz: never calibrated -> all violations, alarm on
        assert(fin("zz").violations == 2L && fin("zz").alarm)
      } finally q.stop()
    }
  }

  test("injected shift trips the alarm that a faithful stream never trips") {
    withRocksDb {
      val input = MemoryStream[(String, Long)](spark)
      val q = ConformalMonitor.monitor(input.toDS(), model).writeStream
        .format("memory").queryName("conf_shift")
        .outputMode(OutputMode.Update).start()
      try {
        // faithful regime: all inside the interval
        input.addData(Seq.fill(8)(("a", 105L)): _*)
        q.processAllAvailable()
        assert(!latest("conf_shift")("a").alarm)
        // shift: the predictor is now wrong for every event
        input.addData(Seq.fill(8)(("a", 400L)): _*)
        q.processAllAvailable()
        val r = latest("conf_shift")("a")
        assert(r.n == 16L && r.violations == 8L && r.viol_ppm == 500000L)
        assert(r.alarm)
      } finally q.stop()
    }
  }
}
