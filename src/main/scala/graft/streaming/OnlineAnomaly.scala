package graft.streaming

import java.sql.Date

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online anomaly detection over the daily stream — the streaming
  * counterpart of the batch scorers: instead of re-deriving history per
  * day (reference EP2), each (region, kw) series keeps Welford running
  * mean/variance in the state store and flags a day the moment its closed
  * daily total z-scores past the threshold.
  *
  * Custom state via `flatMapGroupsWithState` (the stateful API the
  * reference never reaches; SURVEY §2.9 "no mapGroupsWithState"): state is
  * three doubles per series — constant memory per key regardless of
  * history length, which is what makes the 3,500-series (or 3.5M-series)
  * design run forever without growth.
  */
object OnlineAnomaly {

  case class DailyRecord(date: Date, region: String, kw: String, value: Double)

  case class SeriesState(n: Long, mean: Double, m2: Double)

  case class Alert(date: Date, region: String, kw: String, value: Double,
      zscore: Double, n_history: Long)

  /** Welford online update. */
  private[streaming] def update(s: SeriesState, x: Double): SeriesState = {
    val n = s.n + 1
    val d = x - s.mean
    val mean = s.mean + d / n
    SeriesState(n, mean, s.m2 + d * (x - mean))
  }

  private[streaming] def zscore(s: SeriesState, x: Double): Option[Double] =
    if (s.n < 2) None
    else {
      val variance = s.m2 / (s.n - 1)
      if (variance <= 0.0) None else Some((x - s.mean) / math.sqrt(variance))
    }

  /** Score each incoming closed daily row against the series' running
    * stats (built from rows strictly older), then fold it in. Emits only
    * |z| ≥ `zThreshold` rows with ≥ `minHistory` days behind them. */
  def alerts(daily: Dataset[DailyRecord], zThreshold: Double = 3.0,
      minHistory: Int = 7): Dataset[Alert] = {
    import daily.sparkSession.implicits._
    daily
      .groupByKey(r => (r.region, r.kw))
      .flatMapGroupsWithState[SeriesState, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((region, kw), rows, state: GroupState[SeriesState]) =>
          var s = state.getOption.getOrElse(SeriesState(0L, 0.0, 0.0))
          val out = rows.toSeq.sortBy(_.date.getTime).flatMap { r =>
            val alert = zscore(s, r.value) match {
              case Some(z) if s.n >= minHistory && math.abs(z) >= zThreshold =>
                Some(Alert(r.date, region, kw, r.value, z, s.n))
              case _ => None
            }
            s = update(s, r.value)
            alert
          }
          state.update(s)
          out.iterator
      }
  }
}
