package graft.outbreak

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KMeans-distance anomaly scorer — the reference's canonical batch scoring
  * path (SURVEY §2.11 M4/M5; reference notebook SparkBatchProcessKmeanPCA
  * .ipynb cells 6-15, re-derived).
  *
  * score(x) = z-score of the squared Euclidean distance from x's feature
  * vector to its assigned cluster centroid. |z| > 2 flags an anomaly.
  *
  * Scale notes: `fit` collects only k centroids to the driver; the k tiny
  * centroids embed in the plan as an array literal (the reference
  * closure-captured them — SURVEY §3 EP3 notes the serialization cost) and
  * the distance is a native codegen'd expression; the z-score constants
  * come from one scalar aggregate, not a second ML pass.
  */
object AnomalyScorer {

  /** Assemble numeric feature columns into an ML `features` vector
    * (reference Main.scala:263-270). */
  def assemble(wide: DataFrame, featureCols: Seq[String]): DataFrame =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .setHandleInvalid("keep")
      .transform(wide)

  /** Silhouette-maximizing k in `kRange` (reference `select_k`,
    * README.md:713-731 semantics): driver loop over fit/evaluate. Returns
    * the winning FITTED model so the caller never re-fits (same seed ⇒
    * identical model; the reference's loop discards and re-fits). */
  def selectKModel(features: DataFrame, kRange: Range = 2 to 6,
      seed: Long = 1L, localEvalThreshold: Long = 50000L): (Int, KMeansModel) = {
    val cached = features.cache()
    try {
      val n = cached.count()
      // The candidate-k fits are independent Spark jobs over the same
      // cached table — submit them CONCURRENTLY (Spark's scheduler
      // interleaves jobs from different threads) instead of serially: the
      // model-selection wall clock drops from Σ fit(k) to ~max fit(k).
      // Same seed per k ⇒ identical models regardless of completion order.
      def fitAll[T](eval: KMeansModel => T): Seq[(Int, KMeansModel, T)] = {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        Await.result(Future.sequence(kRange.map { k => Future {
          val model = new KMeans().setK(k).setSeed(seed).fit(cached)
          (k, model, eval(model))
        }}.toSeq), Duration.Inf)
      }
      val fitted =
        if (n <= localEvalThreshold) {
          // Feature tables of days × regions rows are tiny next to the raw
          // input; a distributed silhouette pass per candidate k is pure
          // job-scheduling overhead. Collect the vectors ONCE, assign to
          // the fitted centers and evaluate silhouette on the driver.
          // Above the threshold the distributed evaluator takes over.
          val pts = cached.select("features").collect()
            .map(_.getAs[Vector](0).toArray)
          fitAll(model => localSilhouette(pts, model.clusterCenters.map(_.toArray)))
        } else {
          fitAll(model => new ClusteringEvaluator().evaluate(model.transform(cached)))
        }
      // deterministic tie-break: highest silhouette, then smallest k
      val best = fitted.sortBy(_._1).maxBy(_._3)
      (best._1, best._2)
    } finally cached.unpersist()
  }

  /** Mean silhouette with squared-Euclidean distance, computed from
    * cluster aggregates in O(n·k·d): assignment by nearest center (the
    * same rule KMeansModel.transform applies), a/b from per-cluster
    * (Σy, Σ‖y‖², n) — own-cluster mean excludes the point itself;
    * singleton clusters contribute 0 (standard convention). */
  private[outbreak] def localSilhouette(points: Array[Array[Double]],
      centers: Array[Array[Double]]): Double = {
    val k = centers.length
    val d = points.headOption.map(_.length).getOrElse(0)
    def sq(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = x(i) - y(i); s += t * t; i += 1 }
      s
    }
    val assign = points.map { p =>
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < k) { val dd = sq(p, centers(c)); if (dd < bestD) { bestD = dd; best = c }; c += 1 }
      best
    }
    val counts = new Array[Long](k)
    val sums = Array.fill(k)(new Array[Double](d))
    val sqsums = new Array[Double](k)
    points.indices.foreach { i =>
      val c = assign(i); counts(c) += 1
      var j = 0
      while (j < d) { sums(c)(j) += points(i)(j); j += 1 }
      sqsums(c) += points(i).map(x => x * x).sum
    }
    val sil = points.indices.map { i =>
      val x = points(i)
      val own = assign(i)
      if (counts(own) <= 1) 0.0
      else {
        val x2 = x.map(v => v * v).sum
        def totalSq(c: Int): Double = {
          var dot = 0.0; var j = 0
          while (j < d) { dot += x(j) * sums(c)(j); j += 1 }
          counts(c) * x2 - 2.0 * dot + sqsums(c)
        }
        val a = totalSq(own) / (counts(own) - 1.0)
        val b = (0 until k).filter(c => c != own && counts(c) > 0)
          .map(c => totalSq(c) / counts(c)).min
        (b - a) / math.max(a, b)
      }
    }
    if (sil.isEmpty) 0.0 else sil.sum / sil.size
  }

  def selectK(features: DataFrame, kRange: Range = 2 to 6, seed: Long = 1L): Int =
    selectKModel(features, kRange, seed)._1

  /** Squared distance to the ASSIGNED (= nearest) centroid, as native
    * codegen'd expressions: the k centroids (tiny) embed as array
    * literals and the assignment rule "nearest center wins" is simply
    * `least` over the k `graft_sqdist` values — KMeansModel.transform's
    * prediction UDF never enters the scoring plan. `vec` must be the
    * feature vector as `array<double>`. */
  private def sqDistToNearest(centers: Array[Vector], vec: Column): Column = {
    val dists = centers.map { c =>
      call_function("graft_sqdist", vec, typedLit(c.toArray.toSeq))
    }
    if (dists.length == 1) dists.head else least(dists.toIndexedSeq: _*)
  }

  /** The feature vector as a plain `array<double>` column: built straight
    * from the raw numeric columns when the caller names them (pure
    * `array()` expression — zero UDFs in the scoring plan), falling back
    * to `vector_to_array` on the assembled ML vector (one conversion UDF;
    * needed when features came out of PCA and raw columns don't exist). */
  private def vecArray(rawCols: Seq[String]): Column =
    if (rawCols.nonEmpty) array(rawCols.map(c => col(c).cast("double")): _*)
    else org.apache.spark.ml.functions.vector_to_array(col("features"), "float64")

  /** Fit KMeans(k, seed) and return `(date, region, score)` where score is
    * the z-scored squared centroid distance. */
  def kmeansScores(spark: SparkSession, features: DataFrame, k: Int,
      seed: Long = 1L, rawCols: Seq[String] = Nil): DataFrame =
    scoresWithModel(spark, features,
      new KMeans().setK(k).setSeed(seed).fit(features), rawCols)

  /** Score with an already-fitted model (no re-fit, no transform UDF). */
  def scoresWithModel(spark: SparkSession, features: DataFrame,
      model: KMeansModel, rawCols: Seq[String] = Nil): DataFrame = {
    graft.plans.VectorExpressions.register(spark)
    val withDist = features
      .withColumn("distance", sqDistToNearest(model.clusterCenters, vecArray(rawCols)))
      .cache()
    val stats = withDist.agg(
      avg("distance").as("mu"), stddev_samp("distance").as("sigma")).first()
    val (mu, sigma) = (stats.getDouble(0), stats.getDouble(1))
    val denom = if (sigma == 0.0 || sigma.isNaN) 1.0 else sigma
    withDist.select(col("date"), col("region"),
      ((col("distance") - mu) / denom).as("score"))
  }

  /** Keep only |z| > `threshold` outliers (reference notebook cell 15). */
  def outliers(scores: DataFrame, threshold: Double = 2.0): DataFrame =
    scores.where(abs(col("score")) > threshold)
}
