package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Continuous-crawl dedup ingest: a stream of documents is admitted
  * batch-by-batch against a PERSISTED minhash index, so the corpus is
  * never re-scanned — exactly the shape a 100 TB crawl pipeline needs
  * (the index is (id, tokens, band keys); probes touch only matched
  * (band, bucket) lanes).
  *
  * Per micro-batch (foreachBatch runs batches serially, so the index
  * read-modify-append below is race-free):
  *   1. build the batch's [[Dedup.minhashIndex]] rows ONCE;
  *   2. admit via [[Dedup.incrementalMinhashKeep]] against the on-disk
  *      index (existing docs always win; min-id rule within the batch);
  *   3. append survivors to `survivorsPath`;
  *   4. append the RAW batch's index rows — raw, not survivors-only: the
  *      min-id rule lets an already-dropped doc veto later near-dups of
  *      itself, which is what makes batched ingest converge to the
  *      monolithic survivor set (proven in IncrementalDedupSpec and
  *      re-proven end-to-end through this stream in DedupIngestSpec).
  *
  * foreachBatch is AT-LEAST-ONCE: a crash between the two appends and
  * the epoch commit can replay a batch. The appends are made idempotent
  * the same way `graft.app.Main` persists daily rows — writes land in a
  * `__batch=<id>` subdirectory per epoch (dynamic overwrite of that one
  * partition), so a replayed batch overwrites its own output instead of
  * duplicating it.
  */
object DedupIngest {

  /** `docs` must be a STREAMING DataFrame with columns (`idCol`: long,
    * `textCol`: string); ids must be globally unique across the stream's
    * lifetime (any real crawl id scheme qualifies). */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, survivorsPath: String, checkpointDir: String,
      bands: Int = 8, bandSize: Int = 3, threshold: Double = 0.5,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // fold committed epochs (< this one) before probing: the index
        // read below then scans a handful of partitions instead of one
        // per epoch — the small-files ceiling of continuous ingest
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          EpochStore.compact(spark, indexPath, cutoff = batchId)
        val batchIdx = Dedup
          .minhashIndex(batch, idCol, textCol, bands, bandSize).cache()
        // Store-absent vs store-unreadable are DIFFERENT conditions
        // ([[StoreGuard]]): an explicit existence check picks the
        // first-batch path; a present store reads under the
        // writer-derived schema after a loud footer-drift gate. The old
        // broad `catch AnalysisException → first batch` silently
        // degraded incremental dedup to within-batch-only on drift.
        val indexSchema = batchIdx.schema
          .add("__batch", org.apache.spark.sql.types.LongType)
        val admitted =
          if (StoreGuard.exists(spark, indexPath)) {
            StoreGuard.verifyStoreSchema(spark, indexPath, indexSchema,
              Seq(idCol, "__toks", "__b0"))
            val ex = spark.read.schema(indexSchema).parquet(indexPath)
            // Exclude the batch's OWN ids from the probed index: after a
            // crash between the index append and the epoch commit, the
            // replayed batch's rows are already on disk — probing them
            // would make every replayed doc near-dup itself (admitting
            // nothing, then overwriting the survivors partition with an
            // empty set). The anti-join restores the pre-crash index
            // view, so a replay recomputes the identical survivor set.
            // The batch id set is bounded — broadcast.
            Dedup.incrementalMinhashKeep(
              ex.join(org.apache.spark.sql.functions
                .broadcast(batchIdx.select(idCol)), Seq(idCol), "left_anti"),
              batch, idCol, textCol, bands, bandSize, threshold,
              incomingIndex = Some(batchIdx))
          } else
            // first batch: plain within-batch dedup (nothing to probe)
            Dedup.minhashLshKeep(batch, idCol, textCol, bands,
              bandSize, threshold)
        // partition-per-epoch makes the at-least-once replay idempotent
        admitted.write.mode(SaveMode.Overwrite)
          .parquet(s"$survivorsPath/__batch=$batchId")
        batchIdx.write.mode(SaveMode.Overwrite)
          .parquet(s"$indexPath/__batch=$batchId")
        batchIdx.unpersist()
        ()
      }
      .start()
}
