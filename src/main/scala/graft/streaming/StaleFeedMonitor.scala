package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** A feed that stopped reporting: the series' last event time and the
  * event-time deadline that expired on it. */
case class StaleAlert(event_type: String, last_seen_ms: Long,
    deadline_ms: Long)

/** Dead-feed detection on `transformWithState` EVENT-TIME TIMERS — the
  * alarm that fires precisely when a series goes silent, which no
  * row-driven operator can raise (every other monitor here computes on
  * arriving rows; a dead feed's defining property is that rows STOP).
  * The outbreak-surveillance shape: a region that stops reporting is
  * itself the anomaly, and waiting for the next batch job to notice
  * costs the response time the stream exists to buy.
  *
  * Mechanics: each key tracks its max event time; every batch re-arms
  * ONE timer at `lastSeen + staleAfterMs` (previous timers deleted —
  * state per key is one long + one timer, O(keys) total). The timer
  * fires when the WATERMARK passes the deadline, i.e. the silence is
  * certified by event-time progress elsewhere in the stream, not by
  * wall-clock luck; a key that resumes before its deadline simply
  * re-arms and no alert is emitted. Input must carry a watermark
  * (event-time timers do not fire otherwise).
  */
object StaleFeedMonitor {

  private class Detector(staleAfterMs: Long)
      extends StatefulProcessor[String, (String, Long), StaleAlert] {
    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long]("lastSeen",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[StaleAlert] = {
      val maxTs = rows.map(_._2).max
      val prev = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      val newLast = math.max(prev, maxTs)
      lastSeen.update(newLast)
      // exactly one armed deadline per key: late/out-of-order rows must
      // not leave a stale earlier timer behind to false-alarm
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(newLast + staleAfterMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[StaleAlert] = {
      val ls = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      // the guard is belt-and-braces: re-arming deletes superseded
      // timers, so an expiring timer should always be the live deadline
      if (expiredTimerInfo.getExpiryTimeInMs >= ls + staleAfterMs)
        Iterator.single(StaleAlert(key, ls, expiredTimerInfo.getExpiryTimeInMs))
      else Iterator.empty
    }
  }

  /** `typedTimes` is a streaming Dataset of (event_type, eventTimeMs)
    * that ALREADY carries a watermark on its source; emits one
    * [[StaleAlert]] per key whose silence the watermark certifies to
    * exceed `staleAfterMs`. */
  def alerts(typedTimes: Dataset[(String, Long)],
      staleAfterMs: Long): Dataset[StaleAlert] = {
    import typedTimes.sparkSession.implicits._
    typedTimes
      .groupByKey(_._1)
      .transformWithState(new Detector(staleAfterMs), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
