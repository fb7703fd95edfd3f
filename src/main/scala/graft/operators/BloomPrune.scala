package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions

/** Broadcast-bloom semi-join reduction: prune the FACT side of a
  * selective equi-join before it shuffles.
  *
  * At 100 TB the dominant cost of `fact ⋈ dim` on a non-broadcastable
  * dim subset is shuffling every fact row — including the (often vast)
  * majority whose keys cannot match. Spark's own runtime row-level
  * filtering covers some of these shapes; this operator is the explicit
  * version for when the dim side is the result of arbitrary upstream
  * logic: fold the dim keys into a bloom filter (distributed aggregate,
  * driver merge — bytes are O(bits), independent of dim row count),
  * compile it into a native predicate on the fact scan
  * ([[graft.plans.BloomKeyMightContain]]), then run the exact join.
  * Bloom false positives (rate `fpp`) survive the probe and are removed
  * by the join, so results are IDENTICAL to the plain join — the oracle
  * for q89 is the plain SQL join.
  */
object BloomPrune {

  /** Fact rows whose `factKey` might appear in `dim`'s `dimKey` set.
    * `expectedItems` sizes the filter (1M keys @ 1% fpp ≈ 1.2 MB). */
  def pruneFact(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    VectorExpressions.register(fact.sparkSession)
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    fact.where(call_function("graft_bloom_might_contain",
      lit(bos.toByteArray), col(factKey).cast("long")))
  }

  /** Bloom-pruned inner equi-join — drop-in for `fact.join(dim, keys)`
    * when dim is selective but not broadcast-small. */
  def prunedEquiJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val pruned = pruneFact(fact, factKey, dim, dimKey, expectedItems, fpp)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
