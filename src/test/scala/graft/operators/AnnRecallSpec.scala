package graft.operators

import graft.SparkTestBase
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantitative recall verification for the approximate-NN paths (q34 LSH,
  * q49 IVF) against the exact brute-force baseline (q29's machinery) —
  * the reference validates its scorer against known events the same way
  * (README.md:814-833): approximate results must recover the known truth.
  *
  * Planted corpus: 5 queries, each with 10 PLANTED near neighbors
  * (query + small noise ⇒ cosine ≈ 0.99) on a background of seeded random
  * vectors (pairwise cosine ≈ 0.3). The true top-10 is exactly the planted
  * set, so recall is a sharp, deterministic measurement.
  */
class AnnRecallSpec extends SparkTestBase {

  import spark.implicits._

  private val dim = 64
  private val planes = V.gaussianPlanes(6, dim, 42L)

  /** (id, vec) corpus: ids <5 are queries, 1000+ are planted neighbors. */
  private lazy val planted: DataFrame = {
    val rnd = new scala.util.Random(7L)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val queries = (0L until 5L).map(i => (i, unit()))
    val neighbors = queries.flatMap { case (q, qv) =>
      (0 until 10).map { j =>
        val noisy = qv.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
        (1000L + q * 10 + j, noisy)
      }
    }
    val background = (100L until 300L).map(i => (i, unit()))
    (queries ++ neighbors ++ background).toDF("vec_id", "embedding").cache()
  }

  private def bruteForce(e: DataFrame, k: Int): DataFrame = {
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        V.nativeCosine(col("qv"), col("embedding")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id")
  }

  /** recall@k = |approx ∩ exact| / |exact|, averaged over queries. */
  private def recall(approx: DataFrame, exact: DataFrame): Double = {
    val hits = approx.select("query_id", "neighbor_id")
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    hits.toDouble / exact.count()
  }

  test("multiprobe keys: C(6,<=2)=22 distinct buckets, all within Hamming radius") {
    val keys = spark.range(1)
      .select(V.multiprobeKeys(lit("010101"), 6, 2).as("ks"))
      .as[Seq[String]].head()
    assert(keys.size == 22 && keys.distinct.size == 22)
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(keys.forall(k => k.length == 6 && ham(k, "010101") <= 2))
  }

  test("LSH multiprobe: recall@10 >= 0.9 on planted near neighbors") {
    val exact = bruteForce(planted, 10).cache()
    // sanity: the true top-10 is the planted set
    assert(exact.where(col("neighbor_id") >= 1000).count() == 50)
    val approx = AnnLsh.search(planted, planted.where(col("vec_id") < 5),
      planes, "vec_id", "embedding", "vec_id", "embedding", k = 10, radius = 2)
    assert(approx.count() == 50, "multiprobe must fill k for every query")
    val r = recall(approx, exact)
    assert(r >= 0.9, s"LSH recall@10 = $r on planted neighbors")
  }

  test("IVF: recall@10 >= 0.9 on planted near neighbors") {
    val exact = bruteForce(planted, 10)
    val (indexed, centers) = AnnIvf.buildIndex(spark,
      planted.select("vec_id", "embedding"), "embedding", nLists = 8, seed = 1L)
    val queries = planted.where(col("vec_id") < 5)
      .select(col("vec_id").as("__qid"), col("embedding").as("qv"))
    val approx = AnnIvf.search(indexed, centers, queries,
      qVecCol = "qv", vecCol = "embedding", idCol = "vec_id",
      k = 10, nProbe = 3, excludeSelf = true)
    val r = recall(approx, exact)
    assert(r >= 0.9, s"IVF recall@10 = $r on planted neighbors")
  }

  test("corpus floor at sf0.001: q34/q49 recall vs q29 brute force") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.SparkEntry.queries("q29_ann_bruteforce")(spark, dir)
      .select("query_id", "neighbor_id").cache()
    val lsh = graft.SparkEntry.queries("q34_ann_lsh")(spark, dir)
    val ivf = graft.SparkEntry.queries("q49_ann_ivf")(spark, dir)
    // this corpus is near-random (top-10 cosine ~0.3): 0.9 is unreachable
    // for ANY sublinear probe; assert the measured floors so regressions
    // (e.g. losing multiprobe) still fail loudly
    val rLsh = recall(lsh, exact)
    val rIvf = recall(ivf, exact)
    assert(rLsh >= 0.35, s"LSH corpus recall@10 = $rLsh (multiprobe lost?)")
    assert(rIvf >= 0.35, s"IVF corpus recall@10 = $rIvf")
    spark.catalog.clearCache()
  }
}
