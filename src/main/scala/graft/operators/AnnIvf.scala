package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor search.
  *
  * Index build: KMeans coarse-quantize the collection into `nLists` cells;
  * each vector is stored under its nearest centroid (one narrow transform —
  * the "inverted lists" are just a cell_id column, so at scale the
  * collection can be repartitioned/bucketed by cell).
  *
  * Query: probe only the `nProbe` nearest cells per query — the classic
  * recall/cost dial. Candidates = collection rows whose cell is probed by
  * the query; exact cosine + top-k within candidates.
  *
  * Complements the hyperplane-LSH variant: IVF adapts to the data
  * distribution (cells follow density), LSH is oblivious but index-free.
  */
object AnnIvf {

  /** Assign each vector to its IVF cell. Returns the input plus `cell`. */
  def buildIndex(spark: SparkSession, collection: DataFrame, vecCol: String,
      nLists: Int, seed: Long = 1L): (DataFrame, Array[Array[Double]]) = {
    val withVec = collection.withColumn("__v",
      org.apache.spark.ml.functions.array_to_vector(col(vecCol)))
    val model = new KMeans().setK(nLists).setSeed(seed)
      .setFeaturesCol("__v").setPredictionCol("cell").fit(withVec)
    val indexed = model.transform(withVec).drop("__v")
    (indexed, model.clusterCenters.map(_.toArray))
  }

  /** Cells a query probes: the `nProbe` centroids nearest under `dist`
    * (`distAsc = true` for a distance, false for a similarity). Shared by
    * the cosine IVF search here and [[AnnPq.searchIvf]]'s squared-L2
    * probe — the metric is the ONLY thing that differs between them. */
  private[graft] def probeCells(queries: DataFrame, vecCol: String,
      centers: Array[Array[Double]], nProbe: Int, qidCol: String = "__qid",
      dist: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
        VectorFunctions.nativeCosine, distAsc: Boolean = false): DataFrame = {
    val centroids = centers.zipWithIndex.map { case (c, i) => (i, c) }
      .toSeq
    val centroidDf = queries.sparkSession.createDataFrame(centroids)
      .toDF("cell", "centroid")
    val order = if (distAsc) col("__d").asc else col("__d").desc
    val w = Window.partitionBy(qidCol).orderBy(order, col("cell"))
    queries.crossJoin(broadcast(centroidDf))
      .withColumn("__d", dist(col(vecCol), col("centroid")))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= nProbe)
      .drop("__d", "__rk", "centroid")
  }

  /** Top-k cosine neighbors per query, probing nProbe cells. `queries`
    * must carry a unique `__qid` column and the query vector in
    * `qVecCol`. */
  def search(indexed: DataFrame, centers: Array[Array[Double]],
      queries: DataFrame, qVecCol: String, vecCol: String, idCol: String,
      k: Int, nProbe: Int, excludeSelf: Boolean = false): DataFrame =
    searchProbed(indexed, probeCells(queries, qVecCol, centers, nProbe),
      qVecCol, vecCol, idCol, k, excludeSelf)

  /** [[search]] over an already-probed (query × cell) frame — callers
    * that need the probe frame for their own pruning (the persisted
    * store) pass it here instead of re-deriving it. */
  private[graft] def searchProbed(indexed: DataFrame, probed: DataFrame,
      qVecCol: String, vecCol: String, idCol: String,
      k: Int, excludeSelf: Boolean = false): DataFrame = {
    val w = Window.partitionBy("__qid").orderBy(col("sim").desc, col(idCol))
    val candidates = indexed.join(broadcast(probed), Seq("cell"))
    val filtered =
      if (excludeSelf) candidates.where(col(idCol) =!= col("__qid"))
      else candidates
    filtered
      .withColumn("sim", VectorFunctions.nativeCosine(col(qVecCol), col(vecCol)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__qid").as("query_id"), col(idCol).as("neighbor_id"),
        col("rank"), round(col("sim"), 4).as("sim"))
  }
}
