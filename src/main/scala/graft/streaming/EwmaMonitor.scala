package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous EWMA smoothing: the streaming twin of the batch q141
  * ([[graft.queries.Analytics.q141Ewma]], α = 1/2). Per-series state is
  * TWO fields (last day, last smoothed value) — the whole point of
  * exponential smoothing at scale: the batch fold re-reads every
  * historical day, the monitor carries O(1) state per series forever.
  *
  * Exactness: each update is the identical IEEE `(s + n) / 2` the batch
  * fold and the DuckDB oracle perform, so a date-ordered stream
  * reproduces the batch output BIT-FOR-BIT (spec-verified).
  *
  * Day ordering is a CONTRACT, not a hope: series time must be
  * non-decreasing per region across batches (the shape the ingest app's
  * closed-day emission provides). A regression — a day at or before the
  * state's last day — fails loudly rather than silently producing a
  * smoothed value the batch path would never emit. Within a batch, rows
  * are folded in date order regardless of arrival order.
  */
object EwmaMonitor {

  case class DayCount(region: String, date: String, n: Long)
  case class EwmaRow(region: String, date: String, n: Long, ewma_micro: Long)
  case class EwmaState(lastDate: String, s: Double)

  /** Smooth a streaming [[DayCount]] frame (dates as ISO `yyyy-MM-dd`
    * strings — lexicographic = chronological). Emits one [[EwmaRow]]
    * per input day (Update semantics). */
  def monitor(daily: Dataset[DayCount]): Dataset[EwmaRow] = {
    import daily.sparkSession.implicits._
    daily
      .groupByKey(_.region)
      .flatMapGroupsWithState[EwmaState, EwmaRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (region, rows, state: GroupState[EwmaState]) =>
          val days = rows.toSeq.sortBy(_.date)
          var st = state.getOption
          val out = days.map { d =>
            st.foreach { prev =>
              require(d.date > prev.lastDate,
                s"EwmaMonitor: non-monotone day ${d.date} for $region " +
                  s"(state at ${prev.lastDate}) — series must arrive date-ordered")
            }
            val s = st match {
              case None => d.n.toDouble
              case Some(prev) => (prev.s + d.n.toDouble) / 2.0
            }
            st = Some(EwmaState(d.date, s))
            EwmaRow(region, d.date, d.n, Micro.micro(s))
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
