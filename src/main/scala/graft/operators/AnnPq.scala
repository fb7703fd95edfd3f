package graft.operators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions

/** Product Quantization (PQ) approximate nearest neighbor search
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — public algorithm, re-derived on DataFrames).
  *
  * The vector splits into `m` subspaces; each subspace gets its own
  * `ksub`-centroid KMeans codebook; a vector is stored as `m` small
  * codes (m=8, ksub=16 ⇒ 8 codes for a 64-dim float vector — a 64×
  * memory cut). Search is Asymmetric Distance Computation: the QUERY
  * stays exact, each candidate's distance is Σ_j LUT_j[code_j] where
  * LUT_j holds the query-to-centroid distances of subspace j — m table
  * lookups per candidate instead of a dim-length float loop.
  *
  * This is the memory-scale member of the ANN family (vs [[AnnLsh]]
  * index-free probing and [[AnnIvf]] cell pruning): at 100 TB the codes
  * of 10^11 vectors fit where the floats never would, and ADC scans
  * become CPU-cache-resident. The classic production composition is
  * IVF for candidate pruning + PQ codes inside each cell; both halves
  * exist here and compose through [[AnnIvf.buildIndex]]'s `cell` column.
  *
  * Scale shape: training samples a bounded slice (`sampleCap`); the m
  * per-subspace fits run CONCURRENTLY (independent jobs); encode is one
  * narrow map (sub-slices cross an attribute boundary so the argmin's
  * ksub references don't re-inline the slice — see AnnLsh's multiprobe
  * note); search broadcasts one LUT row per query and never shuffles
  * the collection.
  */
object AnnPq {

  /** Per-subspace codebooks: `centers(j)(c)` is centroid c of subspace j. */
  case class Codebooks(m: Int, dsub: Int, centers: Array[Array[Array[Double]]])

  /** Fit the m sub-codebooks concurrently on a bounded sample. */
  def train(collection: DataFrame, vecCol: String, m: Int = 8, ksub: Int = 16,
      seed: Long = 1L, sampleCap: Int = 100000): Codebooks = {
    val dim = collection.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    // deterministic content-keyed sample: limit() on an unordered frame
    // takes whichever partitions answer first, so the codebooks (and the
    // seeded-reproducibility story) would depend on file layout. Ordering
    // by a content hash before the limit is a TakeOrdered (top-k per
    // partition + bounded driver merge, never a global sort) and picks
    // the same rows under any partitioning.
    val sampled = collection.select(col(vecCol))
      .orderBy(xxhash64(col(vecCol))).limit(sampleCap).cache()
    sampled.count()
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fits = (0 until m).map { j =>
      Future {
        val slices = sampled.select(
          org.apache.spark.ml.functions.array_to_vector(
            slice(col(vecCol), j * dsub + 1, dsub)).as("__v"))
        // 10 iterations: sub-codebooks are 16 centroids in a dsub-dim
        // slice — convergence is fast and ADC recall is insensitive to
        // the tail iterations (AnnPqSpec's floor holds)
        new KMeans().setK(ksub).setSeed(seed + j).setMaxIter(10)
          .setFeaturesCol("__v").setPredictionCol("__c")
          .fit(slices).clusterCenters.map(_.toArray)
      }
    }
    val centers = fits.map(f => Await.result(f, Duration.Inf)).toArray
    sampled.unpersist()
    Codebooks(m, dsub, centers)
  }

  /** Add a `codes` column (array<int>, length m): each subspace's nearest
    * codebook entry. Pure narrow map — nothing shuffles. */
  def encode(collection: DataFrame, vecCol: String, cb: Codebooks): DataFrame = {
    VectorExpressions.register(collection.sparkSession)
    // attribute boundary: each slice is referenced ksub times below
    val sliced = collection.select(col("*") +:
      (0 until cb.m).map(j =>
        slice(col(vecCol), j * cb.dsub + 1, cb.dsub).as(s"__s$j")): _*)
    val codeCols = (0 until cb.m).map { j =>
      val dists = array(cb.centers(j).toIndexedSeq.map(c =>
        call_function("graft_sqdist", col(s"__s$j"), typedLit(c.toSeq))): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    sliced.withColumn("codes", array(codeCols: _*))
      .drop((0 until cb.m).map(j => s"__s$j"): _*)
  }

  /** Per-query LUT projection: `__lut{j}` holds the query's distance to
    * every centroid of subspace j. `keepVec` retains the raw query vector
    * as `__qv` for downstream cell probing. Slices sit behind their own
    * projection so the ksub sqdist references don't re-inline them. */
  private def withLuts(queries: DataFrame, cb: Codebooks, qIdCol: String,
      qVecCol: String, keepVec: Boolean): DataFrame = {
    val carried = if (keepVec) Seq("query_id", "__qv") else Seq("query_id")
    val qSliced = queries
      .select(col(qIdCol).as("query_id") +: col(qVecCol).as("__qv") +:
        (0 until cb.m).map(j =>
          slice(col(qVecCol), j * cb.dsub + 1, cb.dsub).as(s"__qs$j")): _*)
    qSliced.select(carried.map(col) ++
      (0 until cb.m).map { j =>
        array(cb.centers(j).toIndexedSeq.map(c =>
          call_function("graft_sqdist", col(s"__qs$j"), typedLit(c.toSeq))): _*)
          .as(s"__lut$j")
      }: _*)
  }

  /** ADC distance of a candidate: m LUT lookups indexed by its codes. */
  private def adistExpr(cb: Codebooks) = (0 until cb.m).map(j =>
    element_at(col(s"__lut$j"), element_at(col("codes"), j + 1) + 1))
    .reduce(_ + _)

  private def topK(withLut: DataFrame, cb: Codebooks, idCol: String, k: Int,
      excludeSelf: Boolean): DataFrame = {
    val filtered =
      if (excludeSelf) withLut.where(col(idCol) =!= col("query_id"))
      else withLut
    val w = Window.partitionBy("query_id").orderBy(col("adist").asc, col(idCol))
    filtered.withColumn("adist", adistExpr(cb))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"),
        round(col("adist"), 4).as("adist"))
  }

  /** Top-k by ADC distance (ascending squared L2 estimate). One LUT row
    * per query (m arrays of ksub distances, built once behind a
    * projection) broadcast against the codes — candidates never touch
    * the original vectors. */
  def search(encoded: DataFrame, cb: Codebooks, queries: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    VectorExpressions.register(encoded.sparkSession)
    val luts = withLuts(queries, cb, qIdCol, qVecCol, keepVec = false)
    topK(encoded.crossJoin(broadcast(luts)), cb, idCol, k, excludeSelf)
  }

  /** IVFADC — the production composition ([[AnnIvf]] cells prune the
    * candidate set, PQ codes rank it): `encoded` must carry the `cell`
    * column from [[AnnIvf.buildIndex]] plus `codes` from [[encode]].
    * Each query probes its `nProbe` nearest cells (squared-L2 to the
    * coarse centroids, consistent with the ADC metric) and only rows in
    * probed cells are scored — at 10^11 vectors the ADC scan touches
    * nProbe/nLists of the codes, and with the collection bucketed by
    * `cell` the probe join is a bucket-pruned lookup, not a shuffle.
    * `searchIvf(nProbe = nLists)` degenerates to exactly [[search]] —
    * asserted in AnnPqSpec. */
  def searchIvf(encoded: DataFrame, cb: Codebooks,
      centers: Array[Array[Double]], queries: DataFrame, qIdCol: String,
      qVecCol: String, idCol: String, k: Int, nProbe: Int,
      excludeSelf: Boolean = true): DataFrame = {
    VectorExpressions.register(encoded.sparkSession)
    val luts = withLuts(queries, cb, qIdCol, qVecCol, keepVec = true)
    val probed = AnnIvf.probeCells(luts, "__qv", centers, nProbe,
        qidCol = "query_id",
        dist = (v, c) => call_function("graft_sqdist", v, c), distAsc = true)
      .drop("__qv")
    topK(encoded.join(broadcast(probed), Seq("cell")), cb, idCol, k,
      excludeSelf)
  }
}
