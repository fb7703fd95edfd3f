package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `q127_source_drift`: per-source KL divergence from
  * a FROZEN baseline distribution, maintained continuously. State per
  * source is one bucket-count array ([[graft.queries.Modeling.DsirBuckets]]
  * longs) — constant forever, like [[HeavyHitters]] — so a crawl
  * pipeline gets a drift alarm per micro-batch instead of a nightly
  * batch scan.
  *
  * The math replicates the batch query exactly: same salted-md5 token
  * buckets, same add-one-smoothed micro-nat log ratios (including
  * Spark's HALF_UP shortest-decimal rounding), same exact integer
  * weighted sum. Streaming the corpus against a baseline built FROM
  * that corpus therefore converges to the batch q127 numbers bit for
  * bit — asserted in DriftMonitorSpec.
  */
object DriftMonitor {

  case class Tok(source: String, bucket: Int)

  case class DriftState(counts: Array[Long])

  case class DriftRow(source: String, n_tok: Long, kl_micro: Long)

  /** Frozen reference distribution: bucket counts + total. */
  case class Baseline(counts: Array[Long], total: Long)

  /** Bucket of one token — replica of the hashMod("kl:", tok, B) column
    * (8-hex md5 prefix mod B). */
  private[streaming] def bucketOf(tok: String, buckets: Int): Int = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"kl:$tok".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    (java.lang.Long.parseLong(hex, 16) % buckets).toInt
  }

  /** Build the frozen baseline from a reference corpus (batch): one
    * count aggregation, O(buckets) rows collected. */
  def baseline(docs: DataFrame, buckets: Int): Baseline = {
    val rows = docs
      .select(explode(split(col("text"), " ")).as("__tok"))
      .select(graft.functions.TextFunctions.hashMod("kl:", col("__tok"), buckets)
        .as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__c"))
      .collect()
    val counts = new Array[Long](buckets)
    rows.foreach(r => counts(r.getLong(0).toInt) = r.getLong(1))
    Baseline(counts, counts.sum)
  }

  private def micro(x: Double): Long = Micro.micro(x)

  /** KL of `counts` against `base` in micro-nats — the q127 formula. */
  private[streaming] def klMicro(counts: Array[Long], base: Baseline): (Long, Long) = {
    val b = counts.length
    val tot = counts.sum
    if (tot == 0L) return (0L, 0L)
    var wsum = java.math.BigInteger.ZERO
    var i = 0
    while (i < b) {
      val ct = counts(i)
      if (ct > 0) {
        val lr = micro(math.log((ct + 1.0) / (tot + b))) -
          micro(math.log((base.counts(i) + 1.0) / (base.total + b)))
        wsum = wsum.add(java.math.BigInteger.valueOf(ct)
          .multiply(java.math.BigInteger.valueOf(lr)))
      }
      i += 1
    }
    (tot, Micro.halfUp(wsum.doubleValue() / tot))
  }

  /** Tokenize a streaming (source, text) frame into [[Tok]] rows —
    * the narrow map feeding [[monitor]]. */
  def tokenize(docs: DataFrame, buckets: Int): Dataset[Tok] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("source"), explode(split(col("text"), " ")).as("__tok"))
      .select(col("source"),
        graft.functions.TextFunctions.hashMod("kl:", col("__tok"), buckets)
          .cast("int").as("bucket"))
      .as[Tok]
  }

  /** Per-source continuous drift vs the broadcast-frozen `base`: each
    * micro-batch re-emits the updated (n_tok, kl_micro) of every source
    * it touched (Update semantics). */
  def monitor(toks: Dataset[Tok], base: Baseline): Dataset[DriftRow] = {
    import toks.sparkSession.implicits._
    val buckets = base.counts.length
    toks
      .groupByKey(_.source)
      .flatMapGroupsWithState[DriftState, DriftRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (source, rows, state: GroupState[DriftState]) =>
          val counts = state.getOption.map(_.counts)
            .getOrElse(new Array[Long](buckets))
          rows.foreach(t => counts(t.bucket) += 1)
          state.update(DriftState(counts))
          val (tot, kl) = klMicro(counts, base)
          Iterator.single(DriftRow(source, tot, kl))
      }
  }
}
