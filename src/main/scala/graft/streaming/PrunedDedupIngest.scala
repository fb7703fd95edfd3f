package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** [[DedupIngest]] over the PRUNABLE lane store ([[Dedup.writeLaneIndex]]
  * layout, epoch-partitioned): the history probe reads only the batch's
  * (band, bucket-prefix) partitions instead of the whole index — the
  * version of continuous dedup whose per-batch cost stays proportional
  * to the batch as history accumulates, which is the property that
  * matters at crawl scale.
  *
  * Store layout (all three epoch-partitioned for at-least-once replay —
  * a replayed batch overwrites its own epoch):
  *   `store/lanes/__batch=N/__band=b/__pfx=x/` — (id, bucket) lane rows;
  *   `store/toks/__batch=N/`                   — (id, tokens) once per doc;
  *   `survivorsPath/__batch=N/`                — admitted docs.
  * Probes exclude the batch's OWN epoch (partition filter), so a crash
  * replay scores against the identical pre-crash view. Raw batches are
  * indexed (admitted or dropped — the min-id veto argument of
  * [[DedupIngest]]). [[EpochStore.compact]] folds committed lane epochs
  * with `subPartitionBy = (band, prefix)`, keeping pruning after the fold.
  */
object PrunedDedupIngest {

  def start(docs: DataFrame, idCol: String, textCol: String,
      storePath: String, survivorsPath: String, checkpointDir: String,
      bands: Int = 8, bandSize: Int = 3, threshold: Double = 0.5,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          EpochStore.compact(spark, s"$storePath/lanes", cutoff = batchId,
            subPartitionBy = Seq("__band", "__pfx"))
          EpochStore.compact(spark, s"$storePath/toks", cutoff = batchId)
        }
        val batchIdx = Dedup
          .minhashIndex(batch, idCol, textCol, bands, bandSize).cache()
        val incLanes = Dedup.laneView(batchIdx, idCol, bands).cache()
        // First batch is detected by an EXPLICIT existence check, not by
        // catching AnalysisException: a broad catch here would silently
        // swallow real analysis errors (schema drift in the persisted
        // store — the exact exception class the r5 testdata regeneration
        // raised) and degrade incremental dedup to within-batch-only with
        // no signal. Real errors must propagate loudly ([[StoreGuard]]).
        val storeExists = StoreGuard.exists(spark, s"$storePath/toks")
        // Store reads carry EXPLICIT schemas, derived from the very
        // frames this stage writes (so they cannot drift from the
        // writer): under heavy load a concurrent lister can catch a
        // store directory in a footerless transient state, and schema
        // INFERENCE is the one reader that turns that into a hard
        // UNABLE_TO_INFER_SCHEMA query failure. A declared schema reads
        // whatever committed files exist — including none. Drift
        // detection (the r5 lesson — a declared schema would silently
        // null a drifted store) moves to [[verifyStoreSchema]]: footer
        // schemas ARE compared whenever footers exist; only the
        // nothing-committed-yet transient skips the check, and then
        // there is nothing to mis-read.
        import org.apache.spark.sql.types.LongType
        val laneSchema = incLanes
          .select(col(idCol), col("__bucket"), col("__band"), col("__pfx"))
          .schema.add("__batch", LongType)
        val toksSchema = batchIdx.select(col(idCol), col("__toks"))
          .schema.add("__batch", LongType)
        val admitted =
          if (storeExists) {
            StoreGuard.verifyStoreSchema(spark, s"$storePath/toks", toksSchema,
              Seq(idCol, "__toks"))
            StoreGuard.verifyStoreSchema(spark, s"$storePath/lanes", laneSchema,
              Seq(idCol, "__bucket"))
            // own-epoch exclusion restores the pre-crash index view on
            // replay; both predicates are partition filters
            val exLanes = Dedup.prunedLaneScan(spark, storePath, incLanes,
              extraCond = col("__batch") =!= batchId,
              schema = Some(laneSchema))
            val exToks = spark.read.schema(toksSchema)
              .parquet(s"$storePath/toks")
              .where(col("__batch") =!= batchId)
            Dedup.prunedAdmit(exLanes, exToks, batch, batchIdx, incLanes,
              idCol, threshold)
          } else {
            // genuinely nothing on disk yet — plain within-batch dedup
            Dedup.minhashLshKeep(batch, idCol, textCol, bands, bandSize,
              threshold)
          }
        admitted.write.mode(SaveMode.Overwrite)
          .parquet(s"$survivorsPath/__batch=$batchId")
        incLanes
          .select(org.apache.spark.sql.functions.col(idCol),
            col("__bucket"), col("__band"), col("__pfx"))
          .write.partitionBy("__band", "__pfx").mode(SaveMode.Overwrite)
          .parquet(s"$storePath/lanes/__batch=$batchId")
        batchIdx.select(col(idCol), col("__toks"))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$storePath/toks/__batch=$batchId")
        incLanes.unpersist(); batchIdx.unpersist()
        ()
      }
      .start()

}
