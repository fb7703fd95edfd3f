package graft.operators

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Persisted IVF index: store search must equal the in-memory search,
  * probes must partition-prune to the probed cell directories, and
  * append must grow the index without moving centroids. */
class AnnIndexStoreSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("store search == in-memory search; probes scan only probed cells") {
    val path = Files.createTempDirectory("ivf_store").toString
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    AnnIndexStore.write(spark, e, "vec_id", "embedding", path, nLists = 16)
    val queries = Tables.embeddings(spark, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("__qid"), col("embedding").as("qv"))

    val fromStore = AnnIndexStore.search(spark, path, queries,
      "qv", "vec_id", "embedding", k = 10, nProbe = 3)
    // same seed → same KMeans → same cells: results must be identical
    val (indexed, centers) = AnnIvf.buildIndex(spark, e, "embedding", 16, 1L)
    val inMemory = AnnIvf.search(indexed, centers, queries,
      "qv", "embedding", "vec_id", k = 10, nProbe = 3)
    val a = fromStore.as[(Long, Long, Int, Double)].collect().toSet
    val b = inMemory.as[(Long, Long, Int, Double)].collect().toSet
    assert(a == b, s"store diverged: ${a.diff(b)} vs ${b.diff(a)}")

    // the probe scan is partition-pruned to the probed cells
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      plan.take(800))
    val probed = AnnIvf.probeCells(queries, "qv", centers, 3)
      .select("cell").distinct().as[Int].collect().toSet
    val touchedDirs = spark.read.parquet(s"$path/cells")
      .where(col("cell").isin(probed.map(_.asInstanceOf[Any]).toSeq: _*))
      .select(input_file_name()).distinct().as[String].collect()
      .map(f => f.split("/").find(_.startsWith("cell=")).get).toSet
    assert(touchedDirs.subsetOf(probed.map(c => s"cell=$c")),
      s"scan touched unprobed cells: $touchedDirs vs $probed")
    assert(touchedDirs.size < 16, "probe read every cell — no pruning")
  }

  test("append assigns to nearest existing centroid; centroids never move") {
    val path = Files.createTempDirectory("ivf_append").toString
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    AnnIndexStore.write(spark, e, "vec_id", "embedding", path, nLists = 16)
    val before = AnnIndexStore.loadCenters(spark, path)

    // append exact copies of two vectors under new ids: each lands in
    // its twin's cell and becomes its twin's perfect neighbor
    val twins = Tables.embeddings(spark, dir)
      .where(col("vec_id").isin(7L, 8L))
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    AnnIndexStore.append(spark, twins, "vec_id", "embedding", path)

    assert(AnnIndexStore.loadCenters(spark, path).map(_.toSeq).toSeq ==
      before.map(_.toSeq).toSeq, "append moved centroids")

    // the narrow assignCell expression reproduces the KMeans transform's
    // cell for EVERY stored vector (same argmin + tie rule)
    val stored = spark.read.parquet(s"$path/cells")
    val mismatches = stored.where(
      AnnIndexStore.assignCell(col("embedding"), before) =!= col("cell"))
    assert(mismatches.isEmpty,
      s"assignCell diverged from KMeans: ${mismatches.collect().take(3).mkString}")

    // duplicate ids are NOT collapsed: two distinct vectors sharing an
    // id both land (a probe-keyed assignment silently dropped one)
    val dup = Tables.embeddings(spark, dir)
      .where(col("vec_id").isin(7L, 8L))
      .select(lit(20000L).as("vec_id"), col("embedding"))
    assert(AnnIndexStore.assign(dup, "vec_id", "embedding", before).count() == 2)
    val queries = Tables.embeddings(spark, dir)
      .where(col("vec_id").isin(7L, 8L))
      .select(col("vec_id").as("__qid"), col("embedding").as("qv"))
    val top = AnnIndexStore.search(spark, path, queries,
      "qv", "vec_id", "embedding", k = 3, nProbe = 2)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    for (q <- Seq(7L, 8L)) {
      val hit = top.find(r => r._1 == q && r._2 == q + 10000L)
      assert(hit.exists(_._3 == 1.0),
        s"appended twin of $q not found at cosine 1.0: ${top.toSeq}")
    }
  }
}
