package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, TimerValues, ValueState}

/** Latest per-shard Bernoulli counts: trials seen, successes seen. */
case class SprtShardRow(shard: Long, n: Long, k: Long)

/** Per-shard running (trials, successes) — the `ValueState` blob
  * (top-level so the product encoder can codegen it). */
case class SprtAgg(n: Long, k: Long)

/** Always-on sequential test — the streaming twin of
  * [[graft.queries.Robust.q272Sprt]]: after any stream prefix, the
  * pooled (n, k) equal the batch prefix's cumulative counts exactly,
  * so the SPRT log-likelihood ratio and its standing decision can be
  * read at ANY moment. SPRT is the one test where that peeking is
  * free by construction — which is exactly why its natural home is a
  * streaming monitor rather than a batch horizon.
  *
  * The LLR is a function of (n, k) ALONE (the Bernoulli likelihood is
  * exchangeable), so the state is two longs per shard and parity with
  * batch holds under any event order, shard count, or micro-batch
  * boundary — no per-key map, no ordering buffer. Sharding (key =
  * event_id mod shards) keeps the stateful operator parallel; pooling
  * is a 2-long sum over ≤ shards rows ([[SprtMonitor.decide]], the
  * same frozen micro-nat constants as batch). */
object SprtMonitor {

  private class Processor
      extends StatefulProcessor[Long, (Long, Long, Boolean), SprtShardRow] {
    @transient private var agg: ValueState[SprtAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[SprtAgg]("counts",
        Encoders.product[SprtAgg], TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Boolean)],
        timerValues: TimerValues): Iterator[SprtShardRow] = {
      var a = Option(agg.get()).getOrElse(SprtAgg(0L, 0L))
      rows.foreach { case (_, _, success) =>
        a = SprtAgg(a.n + 1L, a.k + (if (success) 1L else 0L))
      }
      agg.update(a)
      Iterator(SprtShardRow(key, a.n, a.k))
    }
  }

  /** `trials` = (event_id, success); emits refreshed per-shard counts
    * each micro-batch (Update semantics — last row per shard is
    * current). */
  def stats(trials: Dataset[(Long, Boolean)], shards: Int = 16): Dataset[SprtShardRow] = {
    import trials.sparkSession.implicits._
    trials
      .map { case (id, s) => (java.lang.Math.floorMod(id, shards.toLong), id, s) }
      .groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }

  /** Pool the latest per-shard rows into the SPRT read-out
    * (n, k, llr_micro, decision) — bit-identical to the batch q272
    * trajectory row for the same prefix. */
  def decide(rows: Seq[SprtShardRow]): (Long, Long, Long, String) = {
    val R = graft.queries.Robust
    val n = rows.map(_.n).sum
    val k = rows.map(_.k).sum
    val llr = k * R.SprtLaMicro + (n - k) * R.SprtLbMicro
    val d =
      if (llr >= R.SprtBoundMicro) "accept_h1"
      else if (llr <= -R.SprtBoundMicro) "accept_h0"
      else "continue"
    (n, k, llr, d)
  }
}
