package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PQ quantitative checks on a planted corpus (same construction as
  * AnnRecallSpec): codes must be valid and compact, and ADC search must
  * recover the planted near-neighbors. */
class AnnPqSpec extends SparkTestBase {

  import spark.implicits._

  private val dim = 64

  /** ids <5 are queries; 1000+q*10+j are the 10 planted neighbors of q. */
  private lazy val planted: DataFrame = {
    val rnd = new scala.util.Random(11L)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val queries = (0L until 5L).map(i => (i, unit()))
    val neighbors = queries.flatMap { case (q, qv) =>
      (0 until 10).map { j =>
        (1000L + q * 10 + j, qv.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
      }
    }
    val background = (100L until 300L).map(i => (i, unit()))
    (queries ++ neighbors ++ background).toDF("vec_id", "embedding").cache()
  }

  private lazy val cb = AnnPq.train(planted, "embedding", m = 8, ksub = 16, seed = 1L)
  private lazy val encoded = AnnPq.encode(planted, "embedding", cb).cache()

  test("codes are m integers, each within [0, ksub)") {
    val bad = encoded.select(explode(col("codes")).as("c"))
      .where(col("c") < 0 || col("c") >= 16).count()
    assert(bad == 0)
    assert(encoded.select(size(col("codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(8))
  }

  test("ADC search recovers planted neighbors (recall@10 >= 0.8)") {
    val res = AnnPq.search(encoded, cb, planted.where(col("vec_id") < 5),
      "vec_id", "embedding", "vec_id", k = 10)
    val hits = res
      .where(col("neighbor_id") >= 1000 &&
        floor((col("neighbor_id") - 1000) / 10) === col("query_id"))
      .count()
    val recall = hits.toDouble / 50.0
    assert(recall >= 0.8, s"PQ recall@10 = $recall")
  }

  test("IVFADC: probing all cells degenerates to exactly the full ADC scan") {
    val (indexed, centers) = AnnIvf.buildIndex(spark, planted, "embedding",
      nLists = 8, seed = 3L)
    val enc = AnnPq.encode(indexed, "embedding", cb)
    val full = AnnPq.search(enc, cb,
      planted.where(col("vec_id") < 5), "vec_id", "embedding", "vec_id", k = 10)
    val ivf = AnnPq.searchIvf(enc, cb, centers,
      planted.where(col("vec_id") < 5), "vec_id", "embedding", "vec_id",
      k = 10, nProbe = 8)
    assert(ivf.exceptAll(full).count() == 0 && full.exceptAll(ivf).count() == 0)
  }

  test("IVFADC recovers planted neighbors at nProbe=2 of 8 (recall@10 >= 0.8)") {
    val (indexed, centers) = AnnIvf.buildIndex(spark, planted, "embedding",
      nLists = 8, seed = 3L)
    val enc = AnnPq.encode(indexed, "embedding", cb)
    val res = AnnPq.searchIvf(enc, cb, centers,
      planted.where(col("vec_id") < 5), "vec_id", "embedding", "vec_id",
      k = 10, nProbe = 2)
    val hits = res
      .where(col("neighbor_id") >= 1000 &&
        floor((col("neighbor_id") - 1000) / 10) === col("query_id"))
      .count()
    val recall = hits.toDouble / 50.0
    assert(recall >= 0.8, s"IVFADC recall@10 = $recall")
  }

  test("encode is deterministic across invocations") {
    val again = AnnPq.encode(planted, "embedding", cb)
    val diff = encoded.select(col("vec_id"), col("codes"))
      .exceptAll(again.select(col("vec_id"), col("codes"))).count()
    assert(diff == 0)
  }
}
