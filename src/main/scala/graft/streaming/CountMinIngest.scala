package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.operators.CountMinSketch

/** One sketch cell's running total, emitted whenever the cell changes. */
case class CmCell(i: Int, bucket: Long, c: Long)

/** Continuous Count-Min sketch — the streaming twin of
  * [[graft.operators.CountMinSketch.build]], on the Spark 4
  * `transformWithState` API (the arbitrary-state successor of
  * `flatMapGroupsWithState` used by the older monitors here; state
  * lives in named typed variables inside the RocksDB store instead of
  * one case-class blob, so each cell's counter is an O(1) point
  * update, not a read-modify-write of a whole group object).
  *
  * Semantics contract (spec-proven): after any prefix of the stream,
  * the per-cell totals equal the batch sketch over the rows seen so
  * far — counts live in exactly-once state, so replayed micro-batches
  * cannot double-count, and `min` over a key's cells is the standard
  * Count-Min estimate at every point in time.
  *
  * Scale shape: state cardinality is bounded by depth × width (a few
  * thousand cells) regardless of stream volume — the keyed shuffle
  * fans events into at most that many groups, and each group folds its
  * micro-batch increment locally before one state write.
  */
object CountMinIngest {

  private class CellCounter extends StatefulProcessor[(Int, Long), (Int, Long), CmCell] {
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      total = getHandle.getValueState[Long]("total", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long), rows: Iterator[(Int, Long)],
        timerValues: TimerValues): Iterator[CmCell] = {
      val inc = rows.size.toLong
      val now = (if (total.exists()) total.get() else 0L) + inc
      total.update(now)
      Iterator.single(CmCell(key._1, key._2, now))
    }
  }

  /** `keys` must be a streaming Dataset of the raw key values; emits the
    * changed sketch cells per micro-batch (Update semantics — the last
    * row per (i, bucket) is the current total). */
  def cells(keys: Dataset[Long]): Dataset[CmCell] = {
    import keys.sparkSession.implicits._
    keys.toDF("k")
      .select(explode(array((0 until CountMinSketch.depth).map(i =>
        struct(lit(i).as("_1"),
          CountMinSketch.bucket(col("k"), i).as("_2"))): _*)).as("cell"))
      .select(col("cell._1").as("_1"), col("cell._2").as("_2"))
      .as[(Int, Long)]
      .groupByKey(identity)
      .transformWithState(new CellCounter, TimeMode.None(), OutputMode.Update())
  }

  /** Batch-side estimate over a materialized cell table (e.g. the memory
    * sink of [[cells]], reduced to max per cell — totals are monotone):
    * same min-over-depth lookup as [[CountMinSketch.estimate]]. */
  def estimateFrom(cellTable: DataFrame, keys: DataFrame, keyCol: String): DataFrame =
    CountMinSketch.estimate(
      cellTable.groupBy("i", "bucket").agg(max("c").as("c")), keys, keyCol)
}
