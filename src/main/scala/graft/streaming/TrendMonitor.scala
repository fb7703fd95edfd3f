package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One per-type trend fit as of the latest micro-batch. `slope`/
  * `intercept`/`r2` are None until the series has ≥ 2 distinct days
  * (zero x-variance), mirroring q162's NULL semantics. */
case class TrendRow(event_type: String, n_days: Long,
    slope: Option[Double], intercept: Option[Double], r2: Option[Double])

/** Continuous OLS trend — the streaming twin of
  * [[graft.queries.Inference.q162LinregTrend]], on the Spark 4
  * `transformWithState` API.
  *
  * State per event type is the day→count histogram in a named
  * `MapState` (one RocksDB point-update per touched day, not a
  * read-modify-write of a group blob). That histogram — NOT the raw
  * events — is what makes the twin exact: OLS sufficient statistics
  * over DAILY AGGREGATES contain Σy², which cannot be folded from
  * per-event increments, but the day histogram is itself foldable and
  * bounded by CALENDAR DAYS, not stream volume (the same bounded-state
  * argument as the q87/q165 dense day grid).
  *
  * Semantics contract (spec-proven): after any prefix of the stream,
  * each type's emitted fit equals the batch q162 over the rows seen so
  * far (x anchored at the type's min observed day — slope and R² are
  * translation-invariant in x, and the anchor makes the intercept
  * match the batch global-min anchor whenever every type has data on
  * the corpus' first day). Counts live in exactly-once state, so
  * replayed micro-batches cannot double-count.
  */
object TrendMonitor {

  private class TrendProcessor
      extends StatefulProcessor[String, (String, Long), TrendRow] {
    @transient private var days: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      days = getHandle.getMapState[Long, Long]("days",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[TrendRow] = {
      // fold the micro-batch locally first — one state write per
      // touched day, however many events it carried
      val inc = rows.foldLeft(Map.empty[Long, Long]) { case (m, (_, d)) =>
        m.updated(d, m.getOrElse(d, 0L) + 1L)
      }
      inc.foreach { case (d, c) =>
        val cur = if (days.containsKey(d)) days.getValue(d) else 0L
        days.updateValue(d, cur + c)
      }
      Iterator.single(fit(key, days.iterator().map(p => (p._1, p._2)).toSeq))
    }
  }

  /** Closed-form OLS from the (day, count) histogram — the same six
    * integer sufficient statistics and 6dp rounding as batch q162. */
  private def fit(key: String, hist: Seq[(Long, Long)]): TrendRow = {
    val d0 = hist.iterator.map(_._1).min
    var n, sx, sy, sxx, sxy, syy = 0L
    hist.foreach { case (d, y) =>
      val x = d - d0
      n += 1; sx += x; sy += y
      sxx += x * x; sxy += x * y; syy += y * y
    }
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val cov = n * sxy - sx * sy
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val slope =
      if (varx == 0L) None else Some(r6(cov.toDouble / varx.toDouble))
    val intercept = if (varx == 0L) None
      else Some(r6((sy * sxx - sx * sxy).toDouble / varx.toDouble))
    val r2 = if (varx == 0L || vary == 0L) None
      else Some(r6((cov * cov).toDouble / (varx * vary).toDouble))
    TrendRow(key, n, slope, intercept, r2)
  }

  /** `typedDays` is a streaming Dataset of (event_type, epochDayIndex);
    * emits the refreshed fit per type per micro-batch (Update semantics
    * — the last row per type is current). */
  def fits(typedDays: Dataset[(String, Long)]): Dataset[TrendRow] = {
    import typedDays.sparkSession.implicits._
    typedDays
      .groupByKey(_._1)
      .transformWithState(new TrendProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Adapter from an events-shaped frame (ts, event_type) to the
    * (type, epoch-day) input of [[fits]]. */
  def typedDays(events: DataFrame): Dataset[(String, Long)] = {
    import events.sparkSession.implicits._
    events.select(col("event_type"),
        datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("long"))
      .as[(String, Long)]
  }
}
