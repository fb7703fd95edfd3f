package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialize a BOUNDED result eagerly and release the cached
  * spines it was computed from.
  *
  * The pattern: a query whose plan reuses a bounded spine (day×type
  * counts, a score histogram, a bigram table) in several branches
  * must `persist` that spine or Catalyst re-runs the corpus scan per
  * branch — measured on q225: six full parquet scans for one query.
  * But a persist with no unpersist leaks across a 150-query sweep
  * (the Dedup.scala ADVICE lesson). When the RESULT is also bounded
  * (top-k rows, one row per lag/bucket/type), the clean contract is:
  * collect it while the caches are hot, free every cache, and hand
  * back a local relation. Driver traffic = the result rows the caller
  * was about to collect anyway.
  */
object SmallResult {

  /** Collect `out` (caller guarantees it is bounded), unpersist
    * `cached`, and return the rows as a fresh local-relation frame
    * with the same schema. */
  def materialize(out: DataFrame, cached: DataFrame*): DataFrame = {
    val spark = out.sparkSession
    val rows = out.collect()
    cached.foreach(_.unpersist(blocking = false))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(rows: _*)), out.schema)
  }
}
