package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Behavioral invariants for q138 (Merkle manifest) and q139 (vocab
  * coverage) beyond the DuckDB oracle equivalence the driver checks. */
class ManifestCoverageSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q138: one-doc tamper flips its shard hash and the root, nothing else") {
    import spark.implicits._
    val base = graft.sources.Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("merkle").toString
    base.write.parquet(s"$tmp/clean/documents.parquet")
    val someId = base.select(min("doc_id")).head().getLong(0)
    base.withColumn("text",
        when(col("doc_id") === someId, concat(col("text"), lit(" tampered")))
          .otherwise(col("text")))
      .write.parquet(s"$tmp/dirty/documents.parquet")
    val clean = ScalePipeline.q138MerkleManifest(spark, s"$tmp/clean")
      .collect().map(r => r.getString(0) -> (r.getString(2), r.getString(3))).toMap
    val dirty = ScalePipeline.q138MerkleManifest(spark, s"$tmp/dirty")
      .collect().map(r => r.getString(0) -> (r.getString(2), r.getString(3))).toMap
    assert(clean.keySet == dirty.keySet)
    // every row carries the same root within one manifest
    assert(clean.values.map(_._2).toSet.size == 1)
    assert(clean.values.head._2 != dirty.values.head._2, "root must change")
    val tamperedShard = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"shard:$someId".getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString.take(1)
    }
    for ((shard, (h, _)) <- clean)
      if (shard == tamperedShard) assert(dirty(shard)._1 != h, s"shard $shard must change")
      else assert(dirty(shard)._1 == h, s"shard $shard must not change")
  }

  test("q138: manifest is invariant to input partitioning and row order") {
    import spark.implicits._
    val base = graft.sources.Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("merkleshuf").toString
    base.orderBy(rand(7)).repartition(13)
      .write.parquet(s"$tmp/shuffled/documents.parquet")
    val a = ScalePipeline.q138MerkleManifest(spark, dir)
      .orderBy("shard").collect().toSeq
    val b = ScalePipeline.q138MerkleManifest(spark, s"$tmp/shuffled")
      .orderBy("shard").collect().toSeq
    assert(a == b)
  }

  test("q139: exact mass accounting, final coverage is exactly 1e6 ppm") {
    val rows = ScalePipeline.q139VocabCoverage(spark, dir)
      .orderBy(col("freq").desc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // cum columns really are the running totals of the spectrum rows
    var types = 0L; var mass = 0L
    for ((freq, nTypes, cumTypes, cumMass, ppm) <- rows) {
      types += nTypes; mass += freq * nTypes
      assert(cumTypes == types && cumMass == mass, s"cum mismatch at freq=$freq")
      assert(ppm == cumMass * 1000000L / rows.last._4)
    }
    assert(rows.last._5 == 1000000L, "all types together cover the whole corpus")
    // cross-check the total against an independent count
    val nTokens = graft.sources.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0).count()
    assert(rows.last._4 == nTokens)
  }
}
