package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The Pregel-family edge layout (guide §2.4): the iteration loops in
  * PageRank / BFS / SSSP / LPA / ANF materialize their edge list
  * hash-partitioned by `src` so the per-round `edges ⋈ state ON src`
  * join can REUSE that layout instead of re-exchanging the (large) edge
  * side every round. Locally AQE broadcasts the node-sized state table
  * and the layout is moot — so the assertion runs with broadcast joins
  * disabled (the cluster-scale shape) and counts Exchange nodes: the
  * state side shuffles, the edge side must not. */
class EdgeLayoutSpec extends SparkTestBase {

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    val flat = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    flat.collect { case e: ShuffleExchangeExec => e }.size
  }

  private def withClusterShape(f: => Unit): Unit = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("cached repartition(src) edge list joins with no edge-side exchange") {
    withClusterShape {
      val edges = spark.range(0, 2000)
        .selectExpr("id % 97 as src", "id as dst", "1L as w")
        .repartition(col("src")).cache()
      try {
        val state = spark.range(0, 97).toDF("src").withColumn("d", lit(0L))
        val n = exchanges(edges.join(state, "src"))
        // 1 = the state side only; 2 would mean the edge side re-shuffled
        assert(n == 1, s"expected 1 exchange, got $n")
      } finally edges.unpersist()
    }
  }

  test("checkpointed repartition(src) edge list (the PageRank shape) keeps its layout") {
    withClusterShape {
      val edges = Lineage.cut(spark.range(0, 2000)
        .selectExpr("id % 97 as src", "id as dst", "1L as w")
        .repartition(col("src")))
      val state = spark.range(0, 97).toDF("src").withColumn("d", lit(0L))
      val n = exchanges(edges.join(state, "src"))
      assert(n == 1, s"expected 1 exchange, got $n")
      // and a groupBy on the same key rides the layout too (PageRank's outW)
      val g = exchanges(edges.groupBy("src").agg(sum("w")))
      assert(g == 0, s"expected 0 exchanges for same-key groupBy, got $g")
    }
  }
}
