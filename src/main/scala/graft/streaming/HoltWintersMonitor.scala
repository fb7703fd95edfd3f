package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous Holt–Winters smoothing: the streaming twin of the batch
  * q181 ([[graft.queries.Analytics.q181HoltWinters]], additive weekly
  * seasonality, α = β = γ = 1/2). Per-series state is O(1) forever —
  * level, trend, the 7-slot seasonal ring, and the day index — where
  * the batch fold re-reads the whole history; the monitor is what the
  * decomposition costs on a live feed.
  *
  * Exactness: each update performs the identical IEEE subtract/add/
  * halving sequence the batch `flatMapGroups` fold and the DuckDB
  * recursive CTE perform, and the init division divides the same exact
  * integer — so a date-ordered densified stream reproduces the batch
  * output BIT-FOR-BIT (spec-verified), including the no-emission
  * 7-day warm-up.
  *
  * The day contract is STRICTER than [[EwmaMonitor]]'s monotonicity:
  * days must be monotone AND CONSECUTIVE per region (the seasonal lag
  * is positional — a silently skipped day would shift every later
  * weekday alignment). The densified closed-day emission upstream
  * provides exactly this shape, zero-count days included; a gap fails
  * loudly rather than mis-aligning the season. */
object HoltWintersMonitor {

  case class DayCount(region: String, date: String, n: Long)
  case class HwRow(region: String, date: String, n: Long,
    level_micro: Long, trend_micro: Long, seasonal_micro: Long,
    forecast_micro: Long)
  /** idx = 0-based day index of the NEXT day; ring slot for day t is
    * t % 7. While idx < 7 the `warm` buffer accumulates the first
    * week; l/b/ring are live from idx = 7 on. */
  case class HwState(lastEpochDay: Long, idx: Int, warm: Seq[Long],
    l: Double, b: Double, ring: Seq[Double])

  private def epochDay(iso: String): Long =
    java.time.LocalDate.parse(iso).toEpochDay

  /** Smooth a streaming densified [[DayCount]] frame (ISO dates,
    * consecutive per region). Emits one [[HwRow]] per day from the 8th
    * day on (Update semantics). */
  def monitor(daily: Dataset[DayCount]): Dataset[HwRow] = {
    import daily.sparkSession.implicits._
    daily
      .groupByKey(_.region)
      .flatMapGroupsWithState[HwState, HwRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (region, rows, state: GroupState[HwState]) =>
          val days = rows.toSeq.sortBy(_.date)
          var st = state.getOption
          val out = days.flatMap { d =>
            val e = epochDay(d.date)
            st.foreach { prev =>
              require(e == prev.lastEpochDay + 1,
                s"HoltWintersMonitor: day ${d.date} for $region is not " +
                  s"consecutive to the state's frontier (epoch day " +
                  s"${prev.lastEpochDay}) — the seasonal lag is positional; " +
                  "stream the densified series, zero days included")
            }
            st match {
              case None =>
                st = Some(HwState(e, 1, Seq(d.n), 0.0, 0.0, Nil)); None
              case Some(p) if p.idx < 6 =>
                st = Some(HwState(e, p.idx + 1, p.warm :+ d.n, 0.0, 0.0, Nil)); None
              case Some(p) if p.idx == 6 =>
                // 7th day closes the warm-up: same init arithmetic as
                // the batch fold (integer sum, ONE division)
                val warm = p.warm :+ d.n
                val l0 = warm.sum.toDouble / 7.0
                st = Some(HwState(e, 7, Nil, l0, 0.0,
                  warm.map(_.toDouble - l0)))
                None
              case Some(p) =>
                val t = p.idx
                val sLag = p.ring(t % 7)
                val lN = ((d.n.toDouble - sLag) + (p.l + p.b)) / 2.0
                val bN = ((lN - p.l) + p.b) / 2.0
                val sN = ((d.n.toDouble - lN) + sLag) / 2.0
                val ring = p.ring.updated(t % 7, sN)
                st = Some(HwState(e, t + 1, Nil, lN, bN, ring))
                Some(HwRow(region, d.date, d.n, Micro.micro(lN),
                  Micro.micro(bN), Micro.micro(sN),
                  Micro.micro(lN + bN + ring((t + 1) % 7))))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
