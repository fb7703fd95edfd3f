package graft.streaming

import graft.queries.ScalePipeline
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Continuous training-shard landing: the streaming twin of
  * [[graft.queries.ScalePipeline.writeShards]]. A curated crawl stream
  * lands directly in the layout a trainer reads — hash-sharded, docs in
  * deterministic pseudo-random order — so "turn the crawl into training
  * shards" needs no terminal batch job over the accumulated corpus.
  *
  * Layout: `shardsPath/__batch=<epoch>/shard=<nibble>/part-*`. Epoch on
  * the OUTSIDE makes the at-least-once foreachBatch replay idempotent
  * (a replayed batch overwrites its own epoch, the [[DedupIngest]]
  * scheme); shard on the inside keeps per-shard scan pruning. A trainer
  * reads `shard=X` across epochs via partition pruning; the shard and
  * in-shard order of every doc are pure hash functions of its id, so
  * the multi-epoch layout is the SAME assignment `writeShards` would
  * produce over the union (spec-verified) — epochs only split files.
  *
  * Per epoch a manifest increment (shard, n_docs, n_tokens) lands under
  * `manifestPath/__batch=<epoch>`: counts and token mass are summable
  * across epochs, so the trainer-side audit (and shard-size balancing)
  * needs only an aggregation over manifest rows, never a corpus scan.
  *
  * [[EpochStore.compact]] (wired via `compactEvery`) folds committed
  * epochs with `subPartitionBy = shard`, preserving the nested shard
  * dirs — continuous ingest's small-files growth stays bounded without
  * losing pruning.
  */
object ShardedIngest {

  /** `docs` must be a STREAMING frame with (`doc_id`: long, `text`:
    * string, …payload). */
  def start(docs: DataFrame, shardsPath: String, manifestPath: String,
      checkpointDir: String, compactEvery: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          EpochStore.compact(spark, shardsPath, cutoff = batchId,
            subPartitionBy = Seq("shard"))
          // Manifest consumers SUM rows, so [[EpochStore.compact]]'s
          // crash window (duplicates visible between the compacted
          // partition and not-yet-deleted epochs) would double-count.
          // Each manifest row therefore carries its source epoch as a
          // DATA column (`src_batch`, survives the fold) and
          // [[readManifest]] dedups on it before any SUM — closing the
          // window for every consumer that goes through the reader.
          EpochStore.compact(spark, manifestPath, cutoff = batchId)
        }
        val assigned = ScalePipeline.shardAssign(batch).cache()
        assigned
          // co-locate each shard before the partitioned write — one
          // __ord-sorted file per shard per epoch, not one per input
          // partition (the batch writer does the same)
          .repartition(col("shard"))
          .sortWithinPartitions("shard", "__ord", "doc_id")
          .drop("__n", "__ord")
          .write.partitionBy("shard").mode(SaveMode.Overwrite)
          .parquet(s"$shardsPath/__batch=$batchId")
        assigned.groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("__n").as("n_tokens"))
          .withColumn("src_batch", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$manifestPath/__batch=$batchId")
        assigned.unpersist()
        ()
      }
      .start()

  /** The SUM-safe manifest read: exactly one row per (epoch, shard)
    * regardless of compaction state. During [[EpochStore.compact]]'s
    * crash window an epoch's rows exist both in the compacted partition
    * and in its leftover `__batch=N` dir; those duplicates agree on
    * `src_batch`, so `dropDuplicates` collapses them while distinct
    * epochs (distinct `src_batch`) are preserved. All aggregation over
    * the manifest must go through here. */
  def readManifest(spark: org.apache.spark.sql.SparkSession,
      manifestPath: String): DataFrame =
    spark.read.parquet(manifestPath)
      .dropDuplicates("src_batch", "shard")
      .drop("__batch")
}
