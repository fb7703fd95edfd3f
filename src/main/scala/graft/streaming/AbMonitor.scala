package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TTLConfig, TimerValues, ValueState}

/** Latest per-(shard, arm) experiment sufficient statistics: user
  * count, Σ user-total cents, Σ (user-total cents)². Pool across
  * shards (plain sums) to read the contrast at any moment. */
case class AbShardRow(shard: Long, arm: Int, n_users: Long,
    sum_cents: Long, sumsq_cents: Long)

/** Per-shard running (n, Σt, Σt²) for both arms — the `ValueState`
  * blob (top-level so the product encoder can codegen it). */
case class AbArmAgg(n0: Long, s0: Long, q0: Long,
    n1: Long, s1: Long, q1: Long)

/** Continuous A/B read-out — the streaming twin of
  * [[graft.queries.Uncertainty.q200CupedAbTest]]'s contrast: after any
  * stream prefix, the pooled per-arm statistics equal what the batch
  * computation over the same prefix would produce, so the z-statistic
  * can be read ALWAYS (sequential monitoring) instead of once at a
  * planned horizon.
  *
  * The unit of analysis is the USER (experiment randomization unit),
  * not the event — so per-event folding cannot feed the variance
  * directly (Σy² over user totals is not event-incremental). The state
  * that makes it exact and O(batch): per shard a user→total `MapState`
  * plus per-arm running (n, Σt, Σt²) in a `ValueState`; when a user's
  * total moves t → t′, the arm aggregates absorb (t′ − t) and
  * (t′² − t²) — constant work per touched user, state bounded by USERS
  * (the randomization-unit cardinality), never by event volume.
  *
  * Sharding (key = user_id mod shards) keeps the stateful operator
  * parallel — per-arm statistics are plain sums, so pooling the ≤
  * 2·shards emitted rows is a trivial downstream reduction
  * ([[AbMonitor.zMilli]]). Arm assignment is the SAME md5 draw as
  * batch q200 (`hashMod("exp:", user, 2)`), replicated here on the
  * JVM side — spec-proven identical.
  *
  * Σt² is kept in cents² longs: per SHARD it must stay under 2⁶³
  * (~9.2e18 — e.g. 10⁶ users/shard at ≤ $30k each); raise `shards`
  * before that bound, the pooling is shard-count-invariant. */
object AbMonitor {

  /** Batch-identical arm draw: first 8 md5 hex chars of "exp:<user>"
    * mod 2 (the `TextFunctions.hashMod` contract on the JVM). */
  def armOf(user: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"exp:$user".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    (java.lang.Long.parseLong(hex, 16) % 2L).toInt
  }

  private class AbProcessor
      extends StatefulProcessor[Long, (Long, Long, Long), AbShardRow] {
    @transient private var totals: MapState[Long, Long] = _
    @transient private var agg: ValueState[AbArmAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getMapState[Long, Long]("totals",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      agg = getHandle.getValueState[AbArmAgg]("arms",
        Encoders.product[AbArmAgg], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[AbShardRow] = {
      // fold the micro-batch locally: one state transition per touched
      // user, however many events it carried
      val inc = rows.foldLeft(Map.empty[Long, Long]) { case (m, (_, u, c)) =>
        m.updated(u, m.getOrElse(u, 0L) + c)
      }
      var a = Option(agg.get()).getOrElse(AbArmAgg(0L, 0L, 0L, 0L, 0L, 0L))
      inc.foreach { case (u, dc) =>
        val known = totals.containsKey(u)
        val old = if (known) totals.getValue(u) else 0L
        val nw = old + dc
        totals.updateValue(u, nw)
        val dn = if (known) 0L else 1L
        val ds = nw - old
        val dq = nw * nw - old * old
        a = if (armOf(u) == 0)
          a.copy(n0 = a.n0 + dn, s0 = a.s0 + ds, q0 = a.q0 + dq)
        else a.copy(n1 = a.n1 + dn, s1 = a.s1 + ds, q1 = a.q1 + dq)
      }
      agg.update(a)
      Iterator(AbShardRow(key, 0, a.n0, a.s0, a.q0),
        AbShardRow(key, 1, a.n1, a.s1, a.q1))
    }
  }

  /** `events` = (user_id, cents); emits refreshed per-(shard, arm)
    * sufficient statistics each micro-batch (Update semantics — last
    * row per (shard, arm) is current). */
  def stats(events: Dataset[(Long, Long)], shards: Int = 16): Dataset[AbShardRow] = {
    import events.sparkSession.implicits._
    events
      .map { case (u, c) => (u % shards, u, c) }
      .groupByKey(_._1)
      .transformWithState(new AbProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Pool the latest per-shard rows into the experiment read-out:
    * (n0, n1, mean0, mean1, effect, z·1000) — the batch q200 contrast
    * formula (sample variance from (n, Σt, Σt²), IEEE sqrt, milli
    * snap). None until both arms have ≥ 2 users and variance > 0. */
  def zMilli(rows: Seq[AbShardRow]): Option[(Long, Long, Long, Long, Long, Long)] = {
    def pool(arm: Int): (Long, BigInt, BigInt) = {
      val r = rows.filter(_.arm == arm)
      (r.map(_.n_users).sum,
        r.map(x => BigInt(x.sum_cents)).sum,
        r.map(x => BigInt(x.sumsq_cents)).sum)
    }
    val (n0, s0, q0) = pool(0)
    val (n1, s1, q1) = pool(1)
    if (n0 < 2 || n1 < 2) return None
    def varOf(n: Long, s: BigInt, q: BigInt): BigInt =
      (BigInt(n) * q - s * s) / (BigInt(n) * (n - 1))
    val (v0, v1) = (varOf(n0, s0, q0), varOf(n1, s1, q1))
    val se2 = v0.toDouble / n0 + v1.toDouble / n1
    if (se2 <= 0) return None
    val m0 = (s0 / n0).toLong
    val m1 = (s1 / n1).toLong
    val effect = m1 - m0
    val z = math.round((m1 - m0).toDouble / math.sqrt(se2) * 1000.0)
    Some((n0, n1, m0, m1, effect, z))
  }
}
