package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows, the
  * matching shuffle partition becomes the straggler. Salting splits each
  * key into `buckets` sub-keys: the skewed (large) side gets a
  * deterministic per-row salt, the small side is replicated once per salt
  * value, and the join runs on (key, salt) — spreading the hot key over
  * `buckets` tasks.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) covers sort-merge joins at runtime; explicit salting
  * remains the tool for aggregations-after-join and for engines/joins AQE
  * does not rewrite.
  */
object SkewJoin {

  /** Inner equi-join `large.key == small.key` with `buckets`-way salting.
    * The salt is a hash of the large side's whole row — deterministic, no
    * rand(), so retried tasks salt identically. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.toIndexedSeq.map(col): _*)), lit(buckets)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    saltedLarge.join(replicatedSmall,
        saltedLarge(key) === replicatedSmall(key) &&
          saltedLarge("__salt") === replicatedSmall("__salt"))
      .drop(replicatedSmall(key))
      .drop("__salt")
  }

  /** Convenience: per-key counts on a skewed column via two-phase
    * (salted partial, then final) aggregation — the groupBy analog. */
  def saltedCount(df: DataFrame, key: Column, buckets: Int): DataFrame =
    df.groupBy(key.as("key"),
        pmod(xxhash64(key, monotonically_increasing_id()), lit(buckets))
          .as("__salt"))
      .count()
      .groupBy("key")
      .agg(sum("count").as("count"))
}
