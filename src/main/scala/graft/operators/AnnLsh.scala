package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hyperplane-LSH approximate nearest neighbor search with multiprobe.
  *
  * Index: each vector's bucket is the sign pattern of `planes` fixed
  * random hyperplanes (a narrow map — at scale the collection can be
  * written bucketed/partitioned by this key). Query: probe the query's
  * bucket plus every bucket within Hamming distance `radius`
  * (C(bits, ≤radius) probe keys, exploded and HASH-joined on the bucket
  * key — the collection is never cross-joined or fully scanned per query).
  *
  * Complements [[AnnIvf]]: LSH is index-free and oblivious; IVF adapts
  * cells to data density. Recall scales with how concentrated true
  * neighbors are (see AnnRecallSpec: ≥0.9 on genuinely-near neighbors,
  * ~0.5 on a near-random corpus — an information-theoretic bound on any
  * sublinear probe, not an implementation artifact).
  */
object AnnLsh {

  /** Top-`k` cosine neighbors per query. `queries` must carry `qIdCol`
    * and the query vector in `qVecCol`; self-matches (same id) drop when
    * `excludeSelf`. Output: (query_id, neighbor_id, rank, sim·1e-4). */
  def search(collection: DataFrame, queries: DataFrame,
      planes: Seq[Array[Double]], idCol: String, vecCol: String,
      qIdCol: String, qVecCol: String, k: Int, radius: Int = 2,
      excludeSelf: Boolean = true): DataFrame = {
    val bucketed = collection.select(col(idCol), col(vecCol),
      V.hyperplaneBucket(col(vecCol), planes).as("__bucket"))
    // The bucket must cross an attribute boundary before multiprobe: the
    // flip combinators reference it C(bits,≤radius)·bits times, and
    // inlining the full hyperplane expression at every site multiplies
    // plan size (and codegen time) by ~100× for 5 query rows.
    // CollapseProject keeps the boundary because the bucket is non-cheap
    // and multiply-referenced.
    val probed = queries
      .select(col(qIdCol).as("query_id"), col(qVecCol).as("__qv"),
        V.hyperplaneBucket(col(qVecCol), planes).as("__qb"))
      .select(col("query_id"), col("__qv"),
        explode(V.multiprobeKeys(col("__qb"), planes.length, radius))
          .as("__probe"))
    val joinCond =
      if (excludeSelf)
        col("__bucket") === col("__probe") && col(idCol) =!= col("query_id")
      else col("__bucket") === col("__probe")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    bucketed.join(broadcast(probed), joinCond)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        V.nativeCosine(col("__qv"), col(vecCol)).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }
}
