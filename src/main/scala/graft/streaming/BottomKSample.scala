package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming deterministic bottom-k sample (KMV sketch) per group: keep
  * the k items whose salted md5 hash is smallest — the streaming twin of
  * the batch `q102_bottomk_sample` query, built on the same 60-bit
  * md5-prefix hash.
  *
  * Because bottom-k is a pure function of the item SET (no randomness,
  * no order dependence), the streamed sample after any batch split is
  * BIT-IDENTICAL to the batch query over the union of the batches —
  * asserted in BottomKSampleSpec. That equivalence is what lets a
  * pipeline maintain per-group uniform samples / KMV distinct sketches
  * continuously with k counters of state per group, instead of
  * re-sampling history each day. State: k (hash, item) pairs per group,
  * constant forever, like [[HeavyHitters]].
  */
object BottomKSample {

  case class Item(group: String, item: Long)

  case class BKState(entries: List[(Long, Long)]) // (hash, item), sorted

  case class SampleRow(group: String, item: Long, rank: Int)

  /** One MessageDigest per task thread: `getInstance` per event is an
    * allocation + provider lookup in the hottest per-row path of all
    * three samplers. `digest()` resets the instance after each use. */
  private[streaming] val md5 =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  private[streaming] def md5Hex(s: String): String =
    md5.get().digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The 60-bit md5-prefix hash of "bk:<item>" — same value the batch
    * query and the DuckDB oracle compute. */
  private[streaming] def hash60(item: Long): Long =
    java.lang.Long.parseLong(md5Hex(s"bk:$item").substring(0, 15), 16)

  /** Per-group streaming bottom-`k`: each micro-batch re-emits the
    * current sample of every group it touched (Update semantics). */
  def sample(events: Dataset[Item], k: Int = 8): Dataset[SampleRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.group)
      .flatMapGroupsWithState[BKState, SampleRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (group, rows, state: GroupState[BKState]) =>
          val merged = (state.getOption.map(_.entries).getOrElse(Nil) ++
              rows.map(r => (hash60(r.item), r.item)))
            .distinct.sorted.take(k)
          state.update(BKState(merged))
          merged.zipWithIndex.map { case ((_, item), i) =>
            SampleRow(group, item, i + 1)
          }.iterator
      }
  }
}

/** Streaming twin of `q126_weighted_sample` — Efraimidis–Spirakis
  * weighted bottom-k per group, maintained continuously with k entries
  * of state. The key replica is BIT-IDENTICAL to the batch query's
  * (same 52-bit md5 uniform, same micro-nat ln snap including Spark's
  * HALF_UP decimal rounding, same integer-over-integer division), so
  * the streamed sample after any batch split equals the batch sample of
  * the union — asserted in BottomKSampleSpec. */
object WeightedBottomK {

  case class WItem(group: String, item: Long, weight: Long)

  case class WState(entries: List[(Double, Long, Long)]) // (key, item, weight)

  case class WRow(group: String, item: Long, weight: Long, rank: Int)

  /** Replica of the batch query's exponential key: u from the 52-bit
    * md5 prefix of "ws:<item>", ln snapped to micro-nats with Spark's
    * Round semantics (shortest-decimal BigDecimal, HALF_UP), divided by
    * the integer weight. */
  private[streaming] def key(item: Long, weight: Long): Double = {
    val hex = BottomKSample.md5Hex(s"ws:$item")
    val h = java.lang.Long.parseLong(hex.substring(0, 13), 16)
    val u = (h + 1).toDouble / 4503599627370496.0 // 2^52
    val lnuMicro = Micro.micro(math.log(u))
    (-lnuMicro).toDouble / weight
  }

  /** Per-group streaming weighted bottom-`k` (Update semantics).
    *
    * State entries are keyed by ITEM and merged LAST-WRITE-WINS: an item
    * re-streamed with an updated weight replaces its old entry — the
    * emitted key and weight always reflect the NEWEST weight, never a
    * stale minimum over old weights (a weight decrease must worsen the
    * item's key, not silently keep the old better one). With stable
    * weights the re-keyed entry is bit-identical to the stored one, so
    * the batch-equivalence contract is untouched. */
  def sample(events: Dataset[WItem], k: Int = 8): Dataset[WRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.group)
      .flatMapGroupsWithState[WState, WRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (group, rows, state: GroupState[WState]) =>
          val byItem = scala.collection.mutable.LinkedHashMap
            .empty[Long, (Double, Long, Long)]
          state.getOption.map(_.entries).getOrElse(Nil)
            .foreach(e => byItem(e._2) = e)
          // same-item duplicates WITHIN one batch resolve by the
          // deterministic best-key rule (Spark guarantees no row order
          // inside a trigger, so "last" is undefined there); the
          // resolved batch entry then REPLACES state — cross-batch
          // last-write-wins for re-streamed weight updates
          val fresh = scala.collection.mutable.Map
            .empty[Long, (Double, Long, Long)]
          rows.foreach { r =>
            val e = (key(r.item, r.weight), r.item, r.weight)
            val keep = fresh.get(r.item).forall(c =>
              e._1 < c._1 || (e._1 == c._1 && e._3 < c._3))
            if (keep) fresh(r.item) = e
          }
          fresh.foreach { case (item, e) => byItem(item) = e }
          val merged = byItem.valuesIterator.toList
            .sortBy(e => (e._1, e._2)).take(k)
          state.update(WState(merged))
          merged.zipWithIndex.map { case ((_, item, w), i) =>
            WRow(group, item, w, i + 1)
          }.iterator
      }
  }
}

/** Streaming twin of `q228_priority_sample` — Duffield–Lund–Thorup
  * priority sampling per group, maintained continuously with k+1
  * entries of state. The priority is the batch query's exact integer
  * (w·2⁴⁸ div (h48+1) off the 48-bit md5 prefix of "pr:<item>"), and
  * top-(k+1)-by-priority is MERGEABLE (top of a union = top of the
  * parts' tops), so the streamed sample and threshold after any batch
  * split are BIT-IDENTICAL to the batch query over the union —
  * asserted in BottomKSampleSpec. Keeping the (k+1)-th entry keeps τ
  * exact, which keeps the Horvitz–Thompson estimate Σmax(w, τ)
  * unbiased for the total weight of EVERYTHING ever streamed — a
  * running "how big is this feed really" price off k rows of state.
  */
object PrioritySampleStream {

  case class PItem(group: String, item: Long, weight: Long)

  case class PState(entries: List[(Long, Long, Long)]) // (pr desc, item, w)

  case class PRow(group: String, item: Long, weight: Long, rank: Int,
    wHat: Long)

  /** Replica of the batch query's integer priority: 48-bit md5 prefix
    * of "pr:<item>", pr = w·2⁴⁸ div (h+1) — exact for the same 10⁴-char
    * weights the batch operator documents. */
  private[streaming] def priority(item: Long, weight: Long): Long = {
    val hex = BottomKSample.md5Hex(s"pr:$item")
    val h = java.lang.Long.parseLong(hex.substring(0, 12), 16)
    val big = (BigInt(weight) * BigInt(281474976710656L)) / BigInt(h + 1)
    big.toLong
  }

  /** Per-group streaming priority sample (Update semantics): emits the
    * current ≤ k sample rows of every touched group, each with the
    * group's live Horvitz–Thompson weight max(w, τ).
    *
    * State entries are keyed by ITEM and merged LAST-WRITE-WINS: an item
    * re-streamed with an updated weight replaces its old entry — the
    * emitted weight and priority always reflect the NEWEST weight
    * (a weight decrease must lower the priority, not silently keep the
    * old higher one) and the item never occupies two of the k slots or
    * double-counts in the HT estimate. With stable weights the re-keyed
    * entry is bit-identical to the stored one, so the batch-equivalence
    * contract (unique doc_id in q228) holds. */
  def sample(events: Dataset[PItem], k: Int = 16): Dataset[PRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.group)
      .flatMapGroupsWithState[PState, PRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (group, rows, state: GroupState[PState]) =>
          val byItem = scala.collection.mutable.LinkedHashMap
            .empty[Long, (Long, Long, Long)]
          state.getOption.map(_.entries).getOrElse(Nil)
            .foreach(e => byItem(e._2) = e)
          // within-batch duplicates: deterministic max-priority rule
          // (no row order exists inside a trigger); the resolved entry
          // then REPLACES state — cross-batch last-write-wins
          val fresh = scala.collection.mutable.Map
            .empty[Long, (Long, Long, Long)]
          rows.foreach { r =>
            val e = (priority(r.item, r.weight), r.item, r.weight)
            val keep = fresh.get(r.item).forall(c =>
              e._1 > c._1 || (e._1 == c._1 && e._3 > c._3))
            if (keep) fresh(r.item) = e
          }
          fresh.foreach { case (item, e) => byItem(item) = e }
          val merged = byItem.valuesIterator.toList
            .sortBy(e => (-e._1, e._2)).take(k + 1)
          state.update(PState(merged))
          val tau = if (merged.length == k + 1) merged.last._1 else 0L
          merged.take(k).zipWithIndex.map { case ((_, item, w), i) =>
            PRow(group, item, w, i + 1, math.max(w, tau))
          }.iterator
      }
  }
}
