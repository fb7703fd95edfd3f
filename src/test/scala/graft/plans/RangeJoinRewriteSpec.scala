package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The banded-range-join rewrite: a pure inequality join must come back
  * bit-identical to the naive plan's result but WITHOUT the nested-loop
  * join, via the injected bin equi-key. */
class RangeJoinRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private val width = 1000L
  private def intervals = (0 until 40).map(i => (i.toLong, i * 700L))
    .toDF("w_id", "lo")
  private def points = (0 until 300).map(j => (j.toLong, j * 311L))
    .toDF("p_id", "us")

  private def banded = points.join(intervals,
    col("us") >= col("lo") && col("us") < col("lo") + width)
    .select("p_id", "w_id")

  test("rewrite preserves the exact join result") {
    val naive = banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    try {
      val got = banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive)
      assert(got.nonEmpty, "fixture must produce matches")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rewrite replaces the nested-loop join with a bin equi-join") {
    spark.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    try {
      val p = banded.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        "still a pair-exploding join:\n" + p.take(1000))
      assert(p.contains("__graft_bin"), "bin key missing:\n" + p.take(1000))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("guards: equi-keyed joins and non-band predicates are left alone") {
    spark.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    try {
      // cross-side equi key present: Spark hash-joins already; no rewrite
      val keyed = points.withColumn("k", col("p_id") % 5)
        .join(intervals.withColumn("k", col("w_id") % 5), Seq("k"))
        .where(col("us") >= col("lo") && col("us") < col("lo") + width)
      assert(!keyed.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      // one-sided band (no upper bound): no rewrite
      val oneSided = points.join(intervals, col("us") >= col("lo"))
      assert(!oneSided.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    } finally spark.experimental.extraOptimizations = Nil
  }
}
