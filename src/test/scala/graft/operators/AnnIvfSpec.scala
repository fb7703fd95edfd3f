package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class AnnIvfSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic clustered vectors: 8 clusters × 40 points in 16-d. */
  private def collection() = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextGaussian() * 5))
    (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(v => (v + rnd.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("IVF search achieves high recall vs brute force on clustered data") {
    val e = collection().cache()
    val (indexed, centers) = AnnIvf.buildIndex(spark, e, "embedding",
      nLists = 8, seed = 1L)
    val queries = e.where($"vec_id" < 4)
      .select($"vec_id".as("__qid"), $"embedding".as("qv"))
    val ivf = AnnIvf.search(indexed, centers, queries, "qv", "embedding",
      "vec_id", k = 5, nProbe = 2, excludeSelf = true)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet

    val w = Window.partitionBy("__qid").orderBy($"sim".desc, $"vec_id")
    val brute = e.crossJoin(broadcast(queries))
      .where($"vec_id" =!= $"__qid")
      .withColumn("sim", VectorFunctions.nativeCosine($"qv", $"embedding"))
      .withColumn("rank", row_number().over(w)).where($"rank" <= 5)
      .select($"__qid", $"vec_id").as[(Long, Long)].collect().toSet

    val recall = (ivf intersect brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall; ivf=$ivf brute=$brute")
  }

  test("index assigns every vector to exactly one of nLists cells") {
    val (indexed, centers) = AnnIvf.buildIndex(spark, collection(),
      "embedding", nLists = 8, seed = 1L)
    assert(centers.length == 8)
    assert(indexed.count() == 320)
    assert(indexed.select("cell").distinct().count() <= 8)
  }
}
