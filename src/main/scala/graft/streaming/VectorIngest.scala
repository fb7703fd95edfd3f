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
  * frozen-model rule): assignment is a narrow map against broadcast
  * centroids, no state, no re-clustering. Re-clustering is an offline
  * rebuild + [[EpochStore.compact]]-style fold, never an in-flight
  * mutation readers could tear.
  *
  * [[searchAll]] probes base index + stream epochs as ONE store: the
  * layouts agree on (id, vec, cell), so the union is just two pruned
  * scans.
  */
object VectorIngest {

  /** Assign a static batch of vectors to frozen centroids (squared-L2,
    * the KMeans rule — the [[AnnIndexStore.append]] assignment, shared). */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
      centers: Array[Array[Double]]): DataFrame =
    AnnIvf.probeCells(
        vectors.withColumn("__qid", col(idCol)), vecCol, centers,
        nProbe = 1,
        dist = (a, b) => call_function("graft_sqdist", a.cast("array<double>"), b),
        distAsc = true)
      .select(col(idCol), col(vecCol), col("cell"))

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
    val probeSet = AnnIvf.probeCells(queries, qVecCol, centers, nProbe)
      .select("cell").distinct()
      .collect().map(_.getInt(0))
    val inProbed = col("cell")
      .isin(probeSet.map(_.asInstanceOf[Any]).toIndexedSeq: _*)
    val base = spark.read.parquet(s"$indexPath/cells").where(inProbed)
      .select(col(idCol), col(vecCol), col("cell"))
    val streamed =
      try spark.read.parquet(cellsPath).where(inProbed)
        .select(col(idCol), col(vecCol), col("cell"))
      catch { // no epoch landed yet
        case _: org.apache.spark.sql.AnalysisException => base.limit(0)
      }
    AnnIvf.search(base.unionByName(streamed), centers, queries,
      qVecCol, vecCol, idCol, k, nProbe)
  }
}
