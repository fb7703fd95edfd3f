package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Continuous multimodal ingest: the streaming twin of the batch
  * multimodal pipeline (q35/q155) — the one modality family that had no
  * streaming path. A document stream is rendered to media payloads,
  * images are bilinearly normalized to fixed thumbnails
  * ([[Multimodal.resizeImages]]) and everything is featurized
  * ([[Multimodal.extractFeatures]]) inside ONE narrow per-batch pass;
  * only the small feature rows and normalized thumbnails land on disk.
  *
  * Layout (the package's standard epoch scheme — at-least-once replay
  * overwrites its own epoch):
  *   `mediaPath/__batch=<epoch>/media_type=<t>/` — normalized payloads;
  *   `featuresPath/__batch=<epoch>/`             — (doc_id, n_bytes, features).
  * `media_type` INSIDE the epoch so an image-only consumer (a trainer
  * reading thumbnails) partition-prunes the audio dirs and vice versa.
  * Raw crawl payloads never shuffle: synthesis → resize → featurize →
  * partitioned write all happen in the batch's own tasks; the only
  * exchange is the per-type repartition of the already-normalized
  * (small, fixed-size) records before the partitioned write, which
  * keeps one file per (epoch, type) instead of one per input partition.
  *
  * At 100 TB this is the ingest stage that guarantees every downstream
  * feature/dedup pass reads bounded fixed-size thumbnails instead of
  * unbounded crawl bytes — the batch q155 audit run continuously.
  */
object MediaIngest {

  /** `docs` must be a STREAMING frame with (`doc_id`: long, `text`:
    * string). */
  def start(docs: DataFrame, mediaPath: String, featuresPath: String,
      checkpointDir: String, outW: Int = 16, outH: Int = 16,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          EpochStore.compact(spark, mediaPath, cutoff = batchId,
            subPartitionBy = Seq("media_type"))
          EpochStore.compact(spark, featuresPath, cutoff = batchId)
        }
        val media = Multimodal.resizeImages(
          Multimodal.attachBinary(batch), outW, outH).cache()
        media
          .repartition(col("media_type"))
          .write.partitionBy("media_type").mode(SaveMode.Overwrite)
          .parquet(s"$mediaPath/__batch=$batchId")
        Multimodal.extractFeatures(media)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$featuresPath/__batch=$batchId")
        media.unpersist()
        ()
      }
      .start()
}
