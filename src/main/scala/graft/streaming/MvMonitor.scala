package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, TimerValues, ValueState}

/** Latest per-key summary row: live count, live sum, and the
  * non-retractable extrema — `min_cents`/`max_cents` are exact whenever
  * `needs_rescan` is false; when true, the retraction budget for that
  * extremum is exhausted and the key must be re-read from the base
  * table (the [[graft.queries.Materialize]] dirty-key leg, streamed). */
case class MvRow(key: String, n: Long, sum_cents: Long,
    min_cents: Long, max_cents: Long, needs_rescan: Boolean)

/** Per-key state: retractable (n, Σ) plus the two bounded extrema
  * buffers — `lo` ascending with its truncation flag, `hi` stored
  * NEGATED ascending (so one buffer algebra serves both ends) with
  * its flag. Top-level so the product encoder codegens. */
case class MvAgg(n: Long, sum: Long, lo: Seq[Long], loT: Boolean,
    hi: Seq[Long], hiT: Boolean)

/** Streaming incremental materialized-view maintenance — the
  * `transformWithState` twin of [[graft.queries.Materialize]]'s q215:
  * maintains per-key count / sum / min / max over a CDC stream of
  * inserts (+1) and deletes (−1) in O(batch) work and O(k) state per
  * key.
  *
  * Count and sum are retractable — they fold deltas exactly, forever.
  * Min and max are NOT: deleting the minimum row invalidates a stored
  * scalar min. The bounded fix (the Flink/Materialize "retain-k"
  * discipline): a ≤k-value lower buffer with the invariant *every
  * live value strictly below the buffer's max is in the buffer*.
  * While the buffer has never evicted (`loT` false) it IS the live
  * multiset and everything is exact. Once capacity forces an eviction
  * the buffer is truncated: inserts below the max swap in (evicting
  * the max only tightens the invariant), inserts at-or-above it are
  * UNKNOWN territory and must be ignored — even with spare capacity,
  * because evicted values may live between the max and the newcomer.
  * Deletes below the max provably hit the buffer; at the max they
  * remove an occurrence if present; above it they can't affect the
  * head. The head is therefore the TRUE minimum while the buffer is
  * non-empty; when deletions drain a truncated buffer with rows still
  * live, the min is genuinely unknowable from O(k) state and the row
  * raises `needs_rescan` instead of guessing — the alarm that
  * triggers q215's dirty-key recompute. A buffer holding all n live
  * rows re-tightens (`loT` back to false). Max is the same machine on
  * negated values.
  *
  * At 100 TB: state is keys × O(k) longs regardless of event volume,
  * keys shard across the stateful operator's partitions, and the
  * rescan alarm converts an impossible "exact streaming min under
  * unbounded deletes" into a bounded-frequency batch touch-up whose
  * cost is one partition-pruned key read (q97 discipline). */
object MvMonitor {

  /** Extrema-buffer capacity: each key survives at least k−1
    * consecutive deletions of its current extremum between rescans. */
  val DefaultK = 8

  private class MvProcessor(k: Int)
      extends StatefulProcessor[String, (String, Int, Long), MvRow] {
    @transient private var agg: ValueState[MvAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[MvAgg]("agg",
        Encoders.product[MvAgg], TTLConfig.NONE)

    /** (buffer, truncated) after inserting `v` into an ascending
      * lower-prefix buffer. */
    private def ins(buf: Seq[Long], t: Boolean, v: Long): (Seq[Long], Boolean) =
      if (!t) {
        val b = (v +: buf).sorted
        if (b.size <= k) (b, false) else (b.take(k), true)
      } else if (buf.nonEmpty && v < buf.last) {
        val b = (v +: buf).sorted
        (b.take(k), true)
      } else (buf, true)

    /** (buffer, truncated) after deleting one occurrence of `v`. */
    private def del(buf: Seq[Long], t: Boolean, v: Long): (Seq[Long], Boolean) =
      if (buf.nonEmpty && v <= buf.last && buf.contains(v))
        (buf.diff(Seq(v)), t)
      else (buf, t)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Int, Long)],
        timerValues: TimerValues): Iterator[MvRow] = {
      var a = Option(agg.get()).getOrElse(
        MvAgg(0L, 0L, Nil, loT = false, Nil, hiT = false))
      rows.foreach { case (_, op, v) =>
        if (op > 0) {
          val (lo, lt) = ins(a.lo, a.loT, v)
          val (hn, ht) = ins(a.hi, a.hiT, -v)
          a = MvAgg(a.n + 1, a.sum + v, lo, lt, hn, ht)
        } else {
          val (lo, lt) = del(a.lo, a.loT, v)
          val (hn, ht) = del(a.hi, a.hiT, -v)
          a = MvAgg(a.n - 1, a.sum - v, lo, lt, hn, ht)
        }
      }
      // a buffer that holds every live row is the live multiset again
      a = a.copy(loT = a.loT && a.lo.size < a.n,
        hiT = a.hiT && a.hi.size < a.n)
      if (a.n <= 0) {
        agg.clear()
        Iterator(MvRow(key, 0L, 0L, 0L, 0L, needs_rescan = false))
      } else {
        agg.update(a)
        Iterator(MvRow(key, a.n, a.sum,
          if (a.lo.nonEmpty) a.lo.head else 0L,
          if (a.hi.nonEmpty) -a.hi.head else 0L,
          needs_rescan = a.lo.isEmpty || a.hi.isEmpty))
      }
    }
  }

  /** `cdc` = (key, op ∈ {+1, −1}, cents); emits the refreshed per-key
    * summary each micro-batch (Update semantics — last row per key is
    * current). A delete must carry the deleted row's value (standard
    * CDC before-image), exactly as q215's delete batch does. */
  def summarize(cdc: Dataset[(String, Int, Long)],
      k: Int = DefaultK): Dataset[MvRow] = {
    import cdc.sparkSession.implicits._
    cdc.groupByKey(_._1)
      .transformWithState(new MvProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }
}
