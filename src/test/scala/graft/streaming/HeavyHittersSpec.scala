package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import HeavyHitters.{ItemEvent, TopItem}

/** Space-Saving guarantees on a skewed stream: frequent items survive
  * eviction pressure, counts respect the [true, true+error] envelope,
  * state stays capped, and the sketch carries across micro-batches. */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  // capacity 5 << 22 distinct "us" items forces constant eviction; the
  // guarantee is PER GROUP: "us" sees N = 68 + 32 = 100 events, so any
  // item with true count > N/capacity = 20 is guaranteed tracked —
  // a=50 and b=30 both clear it ("eu" runs its own independent sketch)
  private val batch1 = (1 to 30).map(i => ItemEvent("us", "a", 1L)) ++
    (1 to 18).map(i => ItemEvent("us", "b", 1L)) ++
    (1 to 20).map(i => ItemEvent("us", s"noise$i", 1L))
  private val batch2 = (1 to 20).map(i => ItemEvent("us", "a", 1L)) ++
    (1 to 12).map(i => ItemEvent("us", "b", 1L)) ++
    (1 to 30).map(i => ItemEvent("eu", "x", 1L))

  private def run(): Map[String, Seq[TopItem]] = {
    val input = MemoryStream[ItemEvent](spark)
    val top = HeavyHitters.topK(input.toDS(), capacity = 5, k = 3)
    val name = s"hh_${System.nanoTime()}"
    val q = top.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("hh").toString)
      .start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    // memory sink in update mode appends re-emissions; keep each group's
    // LATEST snapshot = max count per (group, rank)
    val rows = spark.table(name).as[TopItem].collect().toSeq
    rows.groupBy(_.group).map { case (g, rs) =>
      g -> rs.groupBy(_.rank).map(_._2.maxBy(_.count)).toSeq.sortBy(_.rank)
    }
  }

  test("frequent items are guaranteed present with bounded counts") {
    val byGroup = run()
    val us = byGroup("us")
    assert(us.head.item == "a" && us(1).item == "b", us.mkString(","))
    // Space-Saving envelope: true <= reported <= true + error
    val a = us.head; val b = us(1)
    assert(a.count >= 50 && a.count - a.error <= 50, a.toString)
    assert(b.count >= 30 && b.count - b.error <= 30, b.toString)
    // state carried across batches: batch-2-only totals are impossible
    assert(a.count > 20)
  }

  test("groups are independent and state stays within capacity") {
    val byGroup = run()
    assert(byGroup("eu").head.item == "x")
    assert(byGroup("eu").head.error == 0) // eu never hit eviction pressure
    assert(byGroup("eu").head.count == 30)
    assert(byGroup.values.forall(_.size <= 3)) // k bound respected
  }

  test("fold evicts the min counter and inherits its count as error") {
    val m = scala.collection.mutable.HashMap[String, (Long, Long)]()
    HeavyHitters.fold(m, "a", 5L, 2)
    HeavyHitters.fold(m, "b", 3L, 2)
    HeavyHitters.fold(m, "c", 1L, 2) // evicts b (min=3) → c = (4, 3)
    assert(m("c") == (4L, 3L) && !m.contains("b") && m("a") == (5L, 0L))
  }
}
