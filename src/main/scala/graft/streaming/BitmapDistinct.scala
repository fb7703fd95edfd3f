package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.operators.BitmapStore

/** One per-key exact-distinct readout as of the latest micro-batch. */
case class DistinctRow(key: String, nDistinct: Long)

/** Continuous EXACT distinct-count — the streaming twin of the
  * [[graft.operators.BitmapStore]] rollup (q245), on the Spark 4
  * `transformWithState` API.
  *
  * State per key is the dense id bitmap itself (the same canonical
  * trimmed bytes the batch store persists), updated in place each
  * micro-batch: OR is idempotent, so replayed rows and duplicated ids
  * cannot move the count, and after ANY prefix of the stream the
  * emitted value equals batch `count_distinct` over the rows seen so
  * far — exactly, not within HLL error ([[SketchIngest]] is the
  * approximate sibling when the id domain is not compact). State size
  * is max_id/8 bytes per key, volume-independent.
  */
object BitmapDistinct {

  private class BitmapProcessor
      extends StatefulProcessor[String, (String, Long), DistinctRow] {
    @transient private var bm: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bm = getHandle.getValueState[Array[Byte]]("bm", Encoders.BINARY,
        TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[DistinctRow] = {
      val agg = new BitmapStore.IdBitmapAgg
      val merged = rows.foldLeft(
        Option(bm.get()).getOrElse(Array.emptyByteArray)) {
        case (buf, (_, id)) => agg.reduce(buf, id)
      }
      val canonical = agg.finish(merged)
      bm.update(canonical)
      Iterator.single(DistinctRow(key, BitmapStore.popcount(canonical)))
    }
  }

  /** Per-key streaming exact distinct over (key, id) rows. */
  def distinct(events: Dataset[(String, Long)]): Dataset[DistinctRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new BitmapProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
