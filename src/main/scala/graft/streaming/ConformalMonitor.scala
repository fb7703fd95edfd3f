package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, TimerValues, ValueState}

/** Latest per-type conformal violation statistics: observed rows,
  * out-of-interval rows, violation rate (ppm), and the alarm bit. */
case class ConformalRow(event_type: String, n: Long, violations: Long,
    viol_ppm: Long, alarm: Boolean)

/** Running (n, violations) per event type — the `ValueState` blob
  * (top-level so the product encoder can codegen it). */
case class ConformalAgg(n: Long, violations: Long)

/** Continuous conformal-coverage monitor — the streaming twin of
  * [[graft.queries.Uncertainty.q205ConformalInterval]]: the batch
  * query CALIBRATES the per-type interval (ŷ ± q̂) offline; this
  * monitor scores the live stream against that FROZEN artifact and
  * tracks the realized violation rate. Split-conformal theory pins the
  * expected violation rate at ≤ 10% as long as the stream is
  * exchangeable with the calibration data — so a violation rate
  * drifting past the alarm threshold is a distribution-shift detector
  * with a STATISTICAL GUARANTEE attached, not a heuristic: it fires
  * exactly when the calibration contract is broken and the model needs
  * re-fitting. (The same signal, re-read: this is covariate-shift
  * monitoring for a deployed regressor at one compare per event.)
  *
  * State is O(1) per event type — two longs — and the key alphabet is
  * the type vocabulary, never event volume; after any stream prefix
  * the emitted statistics equal the batch count over the same prefix
  * (spec-proven replica parity). Types absent from the calibration
  * artifact count as violations: an interval that was never calibrated
  * covers nothing, and silently passing unseen types would blind the
  * monitor exactly when a new traffic class appears. */
object ConformalMonitor {

  /** Nominal 90% intervals ⇒ ~10% violations; alarm at 2× nominal. */
  val DefaultAlarmPpm = 200000L

  private class Proc(model: Map[String, (Long, Long)], alarmPpm: Long)
      extends StatefulProcessor[String, (String, Long), ConformalRow] {
    @transient private var agg: ValueState[ConformalAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[ConformalAgg]("agg",
        Encoders.product[ConformalAgg], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[ConformalRow] = {
      var a = Option(agg.get()).getOrElse(ConformalAgg(0L, 0L))
      rows.foreach { case (_, cents) =>
        val viol = model.get(key) match {
          case Some((yhat, qhat)) => math.abs(cents - yhat) > qhat
          case None               => true // uncalibrated type: no coverage claim
        }
        a = ConformalAgg(a.n + 1, a.violations + (if (viol) 1L else 0L))
      }
      agg.update(a)
      val ppm = if (a.n == 0) 0L else a.violations * 1000000L / a.n
      Iterator(ConformalRow(key, a.n, a.violations, ppm, ppm > alarmPpm))
    }
  }

  /** `events` = (event_type, cents); `model` = type → (ŷ, q̂) from the
    * batch q205 calibration. Emits the refreshed per-type violation
    * statistics each micro-batch (Update semantics — last row per type
    * is current). */
  def monitor(events: Dataset[(String, Long)],
      model: Map[String, (Long, Long)],
      alarmPpm: Long = DefaultAlarmPpm): Dataset[ConformalRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new Proc(model, alarmPpm), TimeMode.None(),
        OutputMode.Update())
  }
}
