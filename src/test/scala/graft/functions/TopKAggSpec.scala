package graft.functions

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[TopKAgg]]: exact equivalence with the window row_number idiom on
  * adversarial multi-partition data (the merge path), bounded-group and
  * tie behavior, and the physical plan actually being a partial-combining
  * ObjectHashAggregate with no Window/global sort. */
class TopKAggSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val K = 4
  private def topk = udaf(new TopKAgg(K),
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))

  /** Deterministic pseudo-random rows: (group, score, unique payload)
    * with heavy score ties across groups and partitions. */
  private def rows(n: Int): Seq[(Long, Long, Long)] =
    (0 until n).map { i =>
      val h = java.util.UUID.nameUUIDFromBytes(
        s"topk:$i".getBytes("UTF-8")).getMostSignificantBits
      (h & 7L, (h >>> 16) % 97, i.toLong)
    }

  test("aggregate equals the window top-k on multi-partition data") {
    val df = rows(5000).toDF("g", "s", "p").repartition(13).cache()
    val viaAgg = df.groupBy("g").agg(topk($"s", $"p").as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rank"), $"col._1".as("s"), $"col._2".as("p"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("g").orderBy($"s".desc, $"p".desc)
    val viaWindow = df.select($"g", row_number().over(w).cast("long").as("rank"),
        $"s", $"p")
      .where($"rank" <= K)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    df.unpersist()
  }

  test("groups smaller than k emit all rows, descending") {
    val df = Seq((1L, 5L, 100L), (1L, 9L, 101L), (2L, 3L, 102L))
      .toDF("g", "s", "p")
    val got = df.groupBy("g").agg(topk($"s", $"p").as("top"))
      .select($"g", $"top".cast("string"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "[{9, 101}, {5, 100}]")
    assert(got(2L) == "[{3, 102}]")
  }

  test("score ties break on payload, descending") {
    val df = (1L to 10L).map(p => (0L, 7L, p)).toDF("g", "s", "p")
    val got = df.groupBy("g").agg(topk($"s", $"p").as("top"))
      .select(posexplode($"top")).select($"col._2")
      .as[Long].collect().toSeq
    assert(got == Seq(10L, 9L, 8L, 7L))
  }

  test("plan: partial-combining ObjectHashAggregate, no Window, no global sort") {
    val df = rows(200).toDF("g", "s", "p")
      .groupBy("g").agg(topk($"s", $"p").as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.toLowerCase.contains("partial_topkagg"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
