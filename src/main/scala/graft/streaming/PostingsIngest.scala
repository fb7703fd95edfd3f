package graft.streaming

import graft.operators.PostingsStore
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Continuous inverted-index ingest: the streaming twin of
  * [[graft.operators.PostingsStore.write]]. Each micro-batch's postings
  * land `postingsPath/__batch=<epoch>/__pfx=<c>/` — epoch OUTSIDE makes
  * the at-least-once replay idempotent (a replayed batch overwrites its
  * own epoch, the [[DedupIngest]] scheme), prefix inside keeps the
  * probe's directory pruning across every epoch. A phrase probe over
  * the accumulated store reads only its terms' prefix directories of
  * each epoch and equals the batch q143 over the same documents
  * (spec-verified). [[EpochStore.compact]] folds committed epochs with
  * the prefix layout preserved, so small-files growth stays bounded
  * without losing pruning.
  */
object PostingsIngest {

  /** `docs` must be a STREAMING frame with (`doc_id`: long, `text`:
    * string, …). */
  def start(docs: DataFrame, postingsPath: String, checkpointDir: String,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          EpochStore.compact(spark, postingsPath, cutoff = batchId,
            subPartitionBy = Seq("__pfx"))
        PostingsStore.postings(batch)
          .repartition(col("__pfx"))
          .sortWithinPartitions("__pfx", "tok", "doc_id", "pos")
          .write.partitionBy("__pfx").mode(SaveMode.Overwrite)
          .parquet(s"$postingsPath/__batch=$batchId")
        ()
      }
      .start()

  /** Phrase probe over everything ingested so far — prefix-pruned
    * within every epoch partition. */
  def phrase(spark: SparkSession, postingsPath: String, first: String,
      second: String): DataFrame =
    PostingsStore.phraseOn(
      spark.read.parquet(postingsPath)
        .select("doc_id", "pos", "tok", "__pfx"),
      first, second)
}
