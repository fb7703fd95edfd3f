package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming MV maintenance: after every chunk, each key's summary must
  * equal a brute-force recompute of the live multiset — including
  * min/max under deletions — as long as `needs_rescan` is false; an
  * adversarial delete run that drains the lower buffer must raise the
  * rescan flag rather than emit a wrong minimum. */
class MvMonitorSpec extends graft.SparkTestBase {
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

  /** Live multiset per key after replaying `prefix`. */
  private def live(prefix: Seq[(String, Int, Long)]): Map[String, Seq[Long]] =
    prefix.foldLeft(Map.empty[String, Seq[Long]]) {
      case (m, (k, op, v)) =>
        if (op > 0) m.updated(k, m.getOrElse(k, Nil) :+ v)
        else m.updated(k, m(k).diff(Seq(v)))
    }.filter(_._2.nonEmpty)

  private def run(chunks: Seq[Seq[(String, Int, Long)]], name: String,
      k: Int)(check: (Seq[(String, Int, Long)], Map[String, MvRow]) => Unit): Unit =
    withRocksDb {
      val input = MemoryStream[(String, Int, Long)](spark)
      val q = MvMonitor.summarize(input.toDS(), k).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try {
        var prefix = Seq.empty[(String, Int, Long)]
        for (chunk <- chunks) {
          prefix ++= chunk
          input.addData(chunk: _*)
          q.processAllAvailable()
          val latest = spark.table(name).as[MvRow].collect()
            .zipWithIndex.groupBy(_._1.key)
            .map { case (key, rs) => key -> rs.maxBy(_._2)._1 }
          check(prefix, latest)
        }
      } finally q.stop()
    }

  test("summaries equal brute recompute after every chunk, deletes included") {
    val chunks = Seq(
      Seq(("a", 1, 10L), ("a", 1, 50L), ("a", 1, 30L), ("b", 1, 7L)),
      // delete the current min of a; b grows
      Seq(("a", -1, 10L), ("b", 1, 3L), ("b", 1, 99L)),
      // delete a max; re-insert a smaller min; c appears and drains
      Seq(("a", -1, 50L), ("a", 1, 5L), ("c", 1, 1L), ("c", -1, 1L)))
    run(chunks, "mv_exact", k = 8) { (prefix, latest) =>
      val truth = live(prefix)
      for ((key, vs) <- truth) {
        val r = latest(key)
        assert(!r.needs_rescan, s"$key rescan within budget: $r")
        assert((r.n, r.sum_cents, r.min_cents, r.max_cents) ==
          (vs.size.toLong, vs.sum, vs.min, vs.max),
          s"$key: $r != brute ${(vs.size, vs.sum, vs.min, vs.max)}")
      }
      for ((key, r) <- latest if !truth.contains(key))
        assert(r.n == 0L, s"drained key $key still live: $r")
    }
  }

  test("draining the k-extrema buffer raises needs_rescan, never a wrong min") {
    // k = 2: after eviction the buffer tracks {1, 2}; deleting both
    // leaves live rows whose min (3) is unknowable from O(k) state
    val chunks = Seq(
      Seq(("a", 1, 1L), ("a", 1, 2L), ("a", 1, 3L), ("a", 1, 4L)),
      Seq(("a", -1, 1L)),
      Seq(("a", -1, 2L)))
    var sawRescan = false
    run(chunks, "mv_drain", k = 2) { (prefix, latest) =>
      val r = latest("a")
      val vs = live(prefix)("a")
      assert(r.n == vs.size && r.sum_cents == vs.sum, s"retractables drifted: $r")
      if (r.needs_rescan) sawRescan = true
      else assert(r.min_cents == vs.min, s"claimed-exact min is wrong: $r")
      // max side never touched: stays exact throughout
      assert(r.max_cents == vs.max, s"max drifted: $r")
    }
    assert(sawRescan, "buffer drained but rescan never raised")
  }

  test("a key deleted to empty clears state and restarts exact") {
    val chunks = Seq(
      Seq(("a", 1, 9L), ("a", 1, 4L)),
      Seq(("a", -1, 9L), ("a", -1, 4L)),
      Seq(("a", 1, 77L)))
    run(chunks, "mv_restart", k = 2) { (prefix, latest) =>
      val r = latest("a")
      live(prefix).get("a") match {
        case Some(vs) =>
          assert(!r.needs_rescan &&
            (r.n, r.min_cents, r.max_cents) == (vs.size.toLong, vs.min, vs.max))
        case None => assert(r.n == 0L)
      }
    }
  }
}
