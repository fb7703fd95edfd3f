package graft.queries

import graft.SparkTestBase
import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** q131 keep-best dedup, cross-checked on the sf0.001 corpus: clusters
  * must match q70's partition, and every kept doc must be its cluster's
  * argmax quality (ties by min doc_id). */
class KeepBestDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("keep-best agrees with q70 clusters and picks the argmax-quality member") {
    val best = PipelineQueries.q131DedupKeepBest(spark, dir).cache()
    val a = best.select("component", "n_docs").orderBy("component")
      .as[(Long, Long)].collect()
    val b = PipelineQueries.q70DupClusters(spark, dir)
      .select("component", "n_docs").orderBy("component")
      .as[(Long, Long)].collect()
    assert(a.sameElements(b), "q131 must partition the corpus exactly as q70")
    assert(a.exists(_._2 > 1), "fixture must contain a multi-doc cluster")

    // independent ground truth: recompute membership + quality, take the
    // per-cluster argmax under (quality DESC, doc_id ASC)
    val pairs = PipelineQueries.q31NgramJaccard(spark, dir)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val docs = graft.sources.Tables.documents(spark, dir).select("doc_id")
    val members = ConnectedComponents.components(pairs, Some(docs))
      .select(col("id").as("doc_id"), col("component"))
      .join(TextVector.q24Quality(spark, dir), Seq("doc_id"))
    val maxQ = members.groupBy("component").agg(max("quality").as("max_q"))
    val expected = members.join(maxQ, Seq("component"))
      .where(col("quality") === col("max_q"))
      .groupBy("component")
      .agg(min("doc_id").as("keep_id"), max("max_q").as("keep_quality"))
    val mismatches = best.select("component", "keep_id", "keep_quality")
      .exceptAll(expected.select("component", "keep_id", "keep_quality"))
    assert(mismatches.isEmpty, s"wrong survivors: ${mismatches.collect().mkString(", ")}")
  }
}
