package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One per-type distribution-shape readout as of the latest
  * micro-batch; skew/kurt are None until the type has variance. */
case class MomentsRow(event_type: String, n: Long,
    skewMilli: Option[Long], kurtMilli: Option[Long])

/** Continuous skewness/kurtosis — the streaming twin of
  * [[graft.queries.SeriesStats.q235Moments]], on the Spark 4
  * `transformWithState` API.
  *
  * State per event type is the five exact power sums
  * (n, ΣC, ΣC², ΣC³, ΣC⁴) — O(1) per key, stream-volume-independent,
  * and EXACTLY foldable: integer sums commute, so after any prefix of
  * the stream the state equals the batch aggregate over the rows seen
  * so far, and the emitted skew/kurt are BIT-IDENTICAL to q235 on
  * that prefix (same central-moment numerators, same m2·√m2
  * fractional step) — asserted in MomentsMonitorSpec. ΣC³/ΣC⁴ live as
  * BigInt strings in state: a single cent⁴ is ~10¹⁹, past the long
  * range the day it matters (the q144 overflow lesson, applied to
  * state schema).
  */
object MomentsMonitor {

  private type PS = (Long, String, String, String, String) // n, s1..s4

  /** Batch-replica shape math from exact power sums. */
  private[streaming] def shape(n: BigInt, s1: BigInt, s2: BigInt,
      s3: BigInt, s4: BigInt): (Option[Long], Option[Long]) = {
    val m2n = n * s2 - s1 * s1
    if (m2n <= 0) (None, None)
    else {
      val m3n = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
      val m4n = n * n * n * s4 - 4 * n * n * s1 * s3 +
        6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
      val m2d = m2n.toDouble
      // Micro.halfUp, not rint: batch round() is HALF_UP, rint is
      // HALF_EVEN — they disagree on exact .5 boundaries
      val skew = Micro.halfUp(m3n.toDouble / (m2d * math.sqrt(m2d)) * 1000)
      val kurt = Micro.halfUp((m4n.toDouble / (m2d * m2d) - 3.0) * 1000)
      (Some(skew), Some(kurt))
    }
  }

  private class MomentsProcessor
      extends StatefulProcessor[String, (String, Long), MomentsRow] {
    @transient private var ps: ValueState[PS] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ps = getHandle.getValueState[PS]("ps",
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
          Encoders.STRING, Encoders.STRING, Encoders.STRING),
        TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[MomentsRow] = {
      val prev = Option(ps.get()).getOrElse((0L, "0", "0", "0", "0"))
      var n = BigInt(prev._1)
      var s1 = BigInt(prev._2)
      var s2 = BigInt(prev._3)
      var s3 = BigInt(prev._4)
      var s4 = BigInt(prev._5)
      rows.foreach { case (_, c) =>
        val b = BigInt(c)
        n += 1; s1 += b; s2 += b * b; s3 += b * b * b; s4 += b * b * b * b
      }
      ps.update((n.toLong, s1.toString, s2.toString,
        s3.toString, s4.toString))
      val (skew, kurt) = shape(n, s1, s2, s3, s4)
      Iterator.single(MomentsRow(key, n.toLong, skew, kurt))
    }
  }

  /** Per-type streaming moments over (event_type, cents) rows. */
  def monitor(events: Dataset[(String, Long)]): Dataset[MomentsRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new MomentsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
