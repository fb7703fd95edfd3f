package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming top-k leaderboard per group — the streaming twin of the
  * batch [[graft.functions.TopKAgg]] aggregate (q279).
  *
  * Top-k under the TOTAL (score, payload) order is mergeable: the top-k
  * of a union is the top-k of the parts' top-ks, so k pairs of state per
  * group maintain the exact leaderboard continuously — after ANY batch
  * split the streamed result is BIT-IDENTICAL to the batch aggregate
  * over the union (TopKMonitorSpec asserts it). That is what lets a
  * pipeline keep "current k best per key" live (largest purchases,
  * highest-scoring documents, worst latencies) without re-scanning
  * history, with the same eviction semantics the batch query gates.
  *
  * State: ≤ k (score, payload) pairs per group, constant forever. Each
  * micro-batch re-emits the current leaderboard of every touched group
  * (Update semantics). Payloads are assumed unique (the q279 contract);
  * a re-streamed duplicate (score, payload) pair is idempotent because
  * eviction dedups on the exact pair. */
object TopKMonitor {

  case class Entry(group: String, score: Long, payload: Long)

  case class TKState(entries: List[(Long, Long)]) // (score, payload) desc

  case class TopRow(group: String, rank: Int, score: Long, payload: Long)

  /** Per-group streaming top-`k` by (score, payload) descending. */
  def top(events: Dataset[Entry], k: Int = 4): Dataset[TopRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.group)
      .flatMapGroupsWithState[TKState, TopRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (group, rows, state: GroupState[TKState]) =>
          val merged = (state.getOption.map(_.entries).getOrElse(Nil) ++
              rows.map(r => (r.score, r.payload)))
            .distinct.sortBy(e => (-e._1, -e._2)).take(k)
          state.update(TKState(merged))
          merged.zipWithIndex.map { case ((s, p), i) =>
            TopRow(group, i + 1, s, p)
          }.iterator
      }
  }
}
