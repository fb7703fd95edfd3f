package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Farthest-point k-center selection (Gonzalez 1985) — the classic
  * 2-approximation for maximum-coverage diversity sampling, used in
  * training-data curation to pick a small set of maximally-spread
  * exemplars (coreset seeding, eval-set diversification, cluster
  * initialization).
  *
  * Scale shape: the point set never leaves the executors. Each of the
  * k−1 rounds is (a) a narrow `least(minDist, distToNewCenter)` update
  * against the ONE newly chosen center (broadcast as a literal — a few
  * hundred bytes), and (b) a `TakeOrdered(1)` argmax — no shuffle of
  * the points, no driver collection beyond single rows. Lineage stays
  * one round deep via the re-cache/unpersist handoff (the BpeTrainer
  * loop pattern). Cost is k narrow passes — the textbook lower bound
  * for exact greedy k-center.
  *
  * Determinism: the seed is the minimum id; every argmax breaks
  * distance ties by minimum id; distances are the codegen'd
  * `graft_sqdist` (fixed evaluation order) — the same selection on any
  * partitioning (spec-verified).
  */
object KCenter {

  /** Pick `k` centers from (`idCol`: long, `vecCol`: array<float>).
    * Returns (rank, id, radius_micro): rank 1..k in pick order and the
    * point's distance to the previously chosen set when picked (×10⁶,
    * rounded) — rank 1 has radius 0 by convention; radii are
    * non-increasing from rank 2 (the k-center coverage curve). Stops
    * early when every remaining point duplicates a center. */
  def select(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    // dtype-agnostic: float parquet columns and double-promoted
    // transform outputs both land as array<double> (exact widening)
    val pts = df.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
    val seed = pts.orderBy(col(idCol)).limit(1).collect()
    if (seed.isEmpty) return Seq.empty[(Int, Long, Long)].toDF("rank", idCol, "radius_micro")
    // a null or odd-length vector would otherwise vanish silently
    // (null distances sort last under desc) or NPE mid-loop — fail loudly
    val dims = pts.select(when(col(vecCol).isNull, lit(-1))
        .otherwise(size(col(vecCol))).as("d"))
      .distinct().collect().map(_.getInt(0))
    require(dims.length == 1 && dims.head >= 0,
      s"KCenter: vectors must be non-null and equal-length, saw sizes ${dims.sorted.toSeq}")
    // .toArray forces a concrete Array[Double]: rows collected off
    // transformed/cached plans can surface GenericArrayData-backed
    // seqs that Literal.create rejects
    def vecLit(r: org.apache.spark.sql.Row) = typedLit(r.getSeq[Double](1).toArray)
    val chosen = scala.collection.mutable.ArrayBuffer(
      (1, seed(0).getLong(0), 0L))
    var state = pts
      .withColumn("__d", V.nativeSqDist(col(vecCol), vecLit(seed(0))))
      .cache()
    state.count()
    var done = false
    while (!done && chosen.size < k) {
      val next = state.orderBy(col("__d").desc, col(idCol)).limit(1).collect()
      if (next.isEmpty || next(0).getDouble(2) == 0.0) done = true // only duplicates left
      else {
        val row = next(0)
        chosen += ((chosen.size + 1, row.getLong(0),
          math.round(math.sqrt(row.getDouble(2)) * 1e6)))
        val updated = state.withColumn("__d",
          least(col("__d"), V.nativeSqDist(col(vecCol), vecLit(row)))).cache()
        updated.count()
        state.unpersist()
        state = updated
      }
    }
    state.unpersist()
    chosen.toSeq.toDF("rank", idCol, "radius_micro")
  }
}
