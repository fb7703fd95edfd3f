package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction: must be result-identical to the plain
  * join (false positives removed by the exact join), must actually
  * prune, and must probe natively inside codegen — no UDF boundary. */
class BloomPruneSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("pruned equi-join ≡ plain join; the probe filters before the join") {
    val fact = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_quantity"))
    val dim = graft.sources.Tables.supplier(spark, dir)
      .where(col("s_nationkey") === 3).select(col("s_suppkey"))

    val plain = fact.join(dim, fact("l_suppkey") === dim("s_suppkey"))
      .groupBy("s_suppkey").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
    val bloomed = BloomPrune.prunedEquiJoin(fact, "l_suppkey", dim, "s_suppkey",
        expectedItems = 1000L)
      .groupBy("s_suppkey").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))

    val a = plain.orderBy("s_suppkey").collect().toSeq
    val b = bloomed.orderBy("s_suppkey").collect().toSeq
    assert(a == b, s"bloom-pruned join diverged from exact join:\n$a\n$b")
  }

  test("probe prunes non-matching fact rows (few false positives at 1% fpp)") {
    val fact = graft.sources.Tables.lineitem(spark, dir).select(col("l_suppkey"))
    val dim = graft.sources.Tables.supplier(spark, dir)
      .where(col("s_nationkey") === 3).select(col("s_suppkey"))
    val total = fact.count()
    val trueMatch = fact.join(dim, fact("l_suppkey") === dim("s_suppkey"),
      "left_semi").count()
    val pruned = BloomPrune.pruneFact(fact, "l_suppkey", dim, "s_suppkey",
      expectedItems = 1000L).count()
    assert(pruned >= trueMatch, "bloom filter must never drop a true match")
    assert(pruned <= trueMatch + (total * 0.05).toLong + 1,
      s"probe barely pruned: total=$total trueMatch=$trueMatch pruned=$pruned")
  }

  test("probe is a native codegen predicate in the plan, not a UDF") {
    val fact = graft.sources.Tables.lineitem(spark, dir).select(col("l_suppkey"))
    val dim = graft.sources.Tables.supplier(spark, dir)
      .where(col("s_nationkey") === 3).select(col("s_suppkey"))
    val p = BloomPrune.pruneFact(fact, "l_suppkey", dim, "s_suppkey",
      expectedItems = 1000L).queryExecution.executedPlan.toString
    assert(p.contains("graft_bloom_might_contain"), p.take(800))
    assert(!p.toLowerCase.contains("scalaudf"), "probe fell back to a UDF")
  }
}
