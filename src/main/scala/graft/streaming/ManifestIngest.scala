package graft.streaming

import graft.queries.ScalePipeline
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Continuous Merkle manifest: the streaming twin of
  * [[graft.queries.ScalePipeline.q138MerkleManifest]]. Each micro-batch
  * lands its docs' (shard, leaf) digests partition-per-epoch; the
  * manifest (per-shard hash + dataset root) is folded ON READ from the
  * accumulated leaf set, so "fingerprint everything ingested so far"
  * never re-reads document text — only 32-byte digests.
  *
  * Replay safety is SET semantics end to end: a replayed epoch
  * overwrites its own partition (the [[DedupIngest]] scheme), and
  * [[manifest]] dedups leaves before folding, so an at-least-once
  * replay — or the transient duplication [[EpochStore.compact]] can
  * leave behind a crash — can never change a hash. The manifest equals
  * the batch q138 over the distinct documents ingested (spec-verified);
  * like every set-semantics consumer, two ingests of the SAME
  * (doc_id, text) count once.
  */
object ManifestIngest {

  /** `docs` must be a STREAMING frame with (`doc_id`: long, `text`:
    * string, …). Leaf digests land under `leavesPath/__batch=<id>`. */
  def start(docs: DataFrame, leavesPath: String, checkpointDir: String,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          EpochStore.compact(spark, leavesPath, cutoff = batchId)
        ScalePipeline.merkleLeaves(batch).distinct()
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$leavesPath/__batch=$batchId")
        ()
      }
      .start()

  /** The manifest over everything ingested so far — identical columns
    * (shard, n_docs, shard_hash, root_hash) and identical hashes to the
    * batch q138 over the same distinct documents. Empty (zero rows,
    * full schema) before the first epoch lands. */
  def manifest(spark: SparkSession, leavesPath: String): DataFrame = {
    import spark.implicits._
    val leaves =
      try spark.read.parquet(leavesPath).select("shard", "leaf")
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          Seq.empty[(String, String)].toDF("shard", "leaf")
      }
    ScalePipeline.merkleFold(leaves.distinct())
  }
}
