package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters with BOUNDED state: the Space-Saving sketch
  * (Metwally, Agrawal, El Abbadi, "Efficient Computation of Frequent and
  * Top-k Elements in Data Streams", ICDT 2005 — public algorithm,
  * re-derived on `flatMapGroupsWithState`).
  *
  * The exact streaming top-k needs one counter per distinct item —
  * unbounded on an unbounded vocabulary (the state-explosion twin of the
  * unbounded stream-stream join). Space-Saving caps state at `capacity`
  * counters per group and still GUARANTEES: any item whose true count
  * exceeds N/capacity is tracked, and every reported count sits within
  * [true, true + error] with the per-counter `error` reported alongside.
  * That bounded-state-with-error-bars contract is what a per-source
  * trending-terms / hot-keys view runs on at 100 TB/day; the batch
  * counterpart (exact, WindowGroupLimit) is q85.
  *
  * State is one `capacity`-bounded counter list per group key — constant
  * memory per group forever, like [[OnlineAnomaly]]'s Welford state.
  * Update output mode: each micro-batch re-emits the groups it touched.
  */
object HeavyHitters {

  case class ItemEvent(group: String, item: String, weight: Long)

  case class Counter(item: String, count: Long, error: Long)

  case class HHState(counters: List[Counter])

  case class TopItem(group: String, item: String, count: Long, error: Long,
      rank: Int)

  /** Fold one event into the counter table (mutable within a group fold —
    * never crosses a partition). Deterministic eviction: min count, then
    * lexicographic item. */
  private[streaming] def fold(m: scala.collection.mutable.HashMap[String, (Long, Long)],
      item: String, w: Long, capacity: Int): Unit =
    m.get(item) match {
      case Some((c, err)) => m(item) = (c + w, err)
      case None if m.size < capacity => m(item) = (w, 0L)
      case None =>
        val (evictItem, (evictCount, _)) =
          m.minBy { case (i, (c, _)) => (c, i) }
        m.remove(evictItem)
        m(item) = (evictCount + w, evictCount)
    }

  /** Per-group streaming top-`k` by estimated count, at most `capacity`
    * counters of state per group. Emits the current top-k of every group
    * touched by the micro-batch (Update semantics). */
  def topK(events: Dataset[ItemEvent], capacity: Int = 100, k: Int = 10)
      : Dataset[TopItem] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.group)
      .flatMapGroupsWithState[HHState, TopItem](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (group, rows, state: GroupState[HHState]) =>
          val m = scala.collection.mutable.HashMap.newBuilder
            .addAll(state.getOption.toList.flatMap(_.counters)
              .map(c => c.item -> (c.count, c.error)))
            .result()
          rows.foreach(e => fold(m, e.item, e.weight, capacity))
          state.update(HHState(
            m.iterator.map { case (i, (c, e)) => Counter(i, c, e) }.toList))
          m.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k).zipWithIndex
            .map { case ((i, (c, e)), idx) => TopItem(group, i, c, e, idx + 1) }
            .iterator
      }
  }
}
