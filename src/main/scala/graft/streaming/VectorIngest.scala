package graft.streaming

import graft.operators.{AnnIndexStore, AnnIvf}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Continuous vector-index ingest: the streaming twin of
  * [[AnnIndexStore.append]]. An embedding stream (new documents arriving
  * from the crawl embedder) is assigned to the FROZEN coarse quantizer's
  * nearest cell per micro-batch and lands under
  * `cellsPath/__batch=<epoch>/cell=<c>/` — epoch OUTSIDE for the
  * idempotent at-least-once replay every store in this package uses
  * (a replayed batch overwrites its own epoch; [[AnnIndexStore.append]]'s
  * bare `Append` would double vectors on replay), cell INSIDE so probes
  * partition-prune to the probed cell dirs across all epochs.
  *
  * Centroids are immutable while the stream runs (the [[LmRouter]]
  * frozen-model rule): assignment is one codegen'd argmin expression
  * over literal centroids — genuinely narrow, zero shuffle, no state,
  * no re-clustering. Re-clustering is an offline
  * rebuild + [[EpochStore.compact]]-style fold, never an in-flight
  * mutation readers could tear.
  *
  * [[searchAll]] probes base index + stream epochs as ONE store: the
  * layouts agree on (id, vec, cell), so the union is just two pruned
  * scans.
  */
object VectorIngest {

  /** Assign a static batch of vectors to frozen centroids — THE
    * [[AnnIndexStore.assign]] rule, delegated so batch append and
    * stream ingest can never diverge. */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
      centers: Array[Array[Double]]): DataFrame =
    AnnIndexStore.assign(vectors, idCol, vecCol, centers)

  /** `vectors` must be a STREAMING frame of (`idCol`, `vecCol`:
    * array<float>). `indexPath` must hold a written [[AnnIndexStore]]
    * (its centroids are the frozen quantizer). */
  def start(vectors: DataFrame, idCol: String, vecCol: String,
      indexPath: String, cellsPath: String, checkpointDir: String,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val centers = AnnIndexStore.loadCenters(vectors.sparkSession, indexPath)
    vectors.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          EpochStore.compact(batch.sparkSession, cellsPath, cutoff = batchId,
            subPartitionBy = Seq("cell"))
        assign(batch, idCol, vecCol, centers)
          .repartition(col("cell"))
          .write.partitionBy("cell").mode(SaveMode.Overwrite)
          .parquet(s"$cellsPath/__batch=$batchId")
        ()
      }
      .start()
  }

  /** Top-k cosine search over base index + streamed epochs as one
    * collection — both sides pruned to the probed cells. */
  def searchAll(spark: SparkSession, indexPath: String, cellsPath: String,
      queries: DataFrame, qVecCol: String, idCol: String, vecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val centers = AnnIndexStore.loadCenters(spark, indexPath)
    val probed = AnnIvf.probeCells(queries, qVecCol, centers, nProbe).cache()
    val probeSet = probed.select("cell").distinct().collect().map(_.getInt(0))
    val base = AnnIndexStore.readPruned(
      spark, s"$indexPath/cells", probeSet, idCol, vecCol)
    // an explicit existence check, NOT a broad AnalysisException catch —
    // a schema/column error on the streamed side must fail loudly, not
    // silently degrade to base-only results
    val fs = new org.apache.hadoop.fs.Path(cellsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val streamed =
      if (fs.exists(new org.apache.hadoop.fs.Path(cellsPath)))
        AnnIndexStore.readPruned(spark, cellsPath, probeSet, idCol, vecCol)
      else base.limit(0)
    AnnIvf.searchProbed(base.unionByName(streamed), probed,
      qVecCol, vecCol, idCol, k)
  }
}
