package graft.streaming

import graft.operators.SketchStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Continuous sketch maintenance — the streaming twin of
  * [[graft.operators.SketchStore]]: each micro-batch compresses to
  * per-key HLL sketches and lands partition-per-epoch; readers union at
  * query time ([[SketchStore.estimate]]). Raw values are never stored,
  * so state is O(#keys × kilobytes) per epoch regardless of stream
  * volume, and a crash-replayed batch overwrites its own partition with
  * identical registers (sketching is deterministic per row set).
  * [[EpochStore.compact]] folds old epochs as-is — estimate() is a
  * set-semantics consumer, so transient compaction duplicates are
  * harmless by the union's idempotence. */
object SketchIngest {

  def start(rows: DataFrame, keyCols: Seq[String], valueCol: String,
      path: String, checkpointDir: String, compactEvery: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          EpochStore.compact(batch.sparkSession, path, cutoff = batchId)
        SketchStore.append(batch, keyCols, valueCol, path, batchId)
        ()
      }
      .start()
}
