package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling smoke: times the heavy text/dedup operators on the sf0.1
  * corpus and on a 10× synthetic blow-up of it (each replica mutated by
  * an appended marker token, so replicas are NEAR-dups — the worst case
  * for candidate generation: every doc sits in a 10-deep dup clique).
  * A scale-safe operator should grow ≲ linearly in rows here; anything
  * quadratic in clique/bucket size explodes visibly at 10×.
  *
  * Dev tool (not part of the driver contract): run with
  * `sbt "runMain graft.tools.ScaleSmoke"`.
  */
object ScaleSmoke {

  private def blowUp(docs: DataFrame, copies: Int, nDocs: Long): DataFrame =
    (0 until copies).map { k =>
      if (k == 0) docs
      else docs.select((col("doc_id") + k * nDocs).as("doc_id"),
        concat_ws(" ", col("text"), lit(s"replica$k")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.1").cache()
    val n = base.count()
    val big = blowUp(base, 10, n)
      .repartition(32).cache()
    val nBig = big.count()
    println(s"[scale] corpus 1x = $n docs, 10x = $nBig docs")

    def time(name: String)(f: DataFrame => DataFrame): Unit = {
      for ((label, df) <- Seq("1x" -> base, "10x" -> big)) {
        val t0 = System.nanoTime()
        val out = f(df)
        val rows = out.count()
        println(f"[scale] $name%-22s $label%3s  ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($rows rows)")
        spark.catalog.clearCache()
        base.cache().count(); big.cache().count() // keep inputs hot
      }
    }

    time("minhashLshKeep (exact)")(d =>
      graft.operators.Dedup.minhashLshKeep(d, "doc_id", "text", threshold = 0.5))
    time("minhashLshKeep (cap=512)")(d =>
      graft.operators.Dedup.minhashLshKeep(d, "doc_id", "text", threshold = 0.5,
        denseBucketCap = 512))
    time("dup_spans")(graft.queries.Curation.q105DupSpansOn)
    time("lm_score")(graft.queries.Curation.q106LmScoreOn)
    time("knn_graph") { d =>
      val sig = graft.operators.Dedup.minhashIndex(d, "doc_id", "text")
      val cand = graft.operators.Dedup.sortedNeighborCandidates(sig, "doc_id", 8)
      cand
    }
    time("exactKeep")(d => graft.operators.Dedup.exactKeep(d, "doc_id", "text"))
    spark.stop()
  }
}
