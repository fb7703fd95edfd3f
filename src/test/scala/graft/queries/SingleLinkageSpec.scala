package graft.queries

import graft.SparkTestBase
import graft.operators.{ConnectedComponents, Mst}
import org.apache.spark.sql.functions._

/** q202: the MST-cut identity — clusters from cutting the spanning
  * forest at τ must equal connected components of the FULL graph
  * thresholded at τ. This is the property that makes the forest a
  * reusable artifact (sweep any radius without re-clustering). */
class SingleLinkageSpec extends SparkTestBase {
  import spark.implicits._

  test("MST cut equals threshold components on a planted weighted graph") {
    // two tight cliques (weights 1-3) joined by a weight-10 bridge, plus
    // a weight-5 intra-clique slack edge the MST drops
    val edges = Seq(
      (1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 5L),
      (10L, 11L, 1L), (11L, 12L, 3L), (10L, 12L, 5L),
      (3L, 10L, 10L)
    ).toDF("a", "b", "w")
    val nodes = edges.select(col("a").as("id"))
      .unionByName(edges.select(col("b").as("id"))).distinct()
    for (tau <- Seq(0L, 2L, 5L, 10L)) {
      val viaMst = ConnectedComponents.components(
        Mst.boruvka(edges).where(col("w") <= tau)
          .select(col("a").as("src"), col("b").as("dst")),
        Some(nodes)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val direct = ConnectedComponents.components(
        edges.where(col("w") <= tau)
          .select(col("a").as("src"), col("b").as("dst")),
        Some(nodes)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaMst == direct, s"cut/threshold mismatch at tau=$tau")
    }
  }

  test("q202 equals thresholded components of the full graph on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val edges = Reliability.mutualDistanceEdges(spark, dir)
    val nodes = edges.select(col("a").as("id"))
      .unionByName(edges.select(col("b").as("id"))).distinct()
    val direct = ConnectedComponents.components(
      edges.where(col("w") <= Reliability.SlTauPpm)
        .select(col("a").as("src"), col("b").as("dst")),
      Some(nodes)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Reliability.q202SingleLinkage(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == direct)
    assert(got.nonEmpty)
  }
}
