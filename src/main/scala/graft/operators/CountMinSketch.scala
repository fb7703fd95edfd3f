package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Count-Min sketch over a Long key column, built as a plain
  * relational aggregation so Catalyst keeps whole-stage codegen and
  * map-side partial aggregation: `CM[i][j] = count of rows whose
  * hash_i(key) lands in bucket j`. The sketch table is `depth × width`
  * rows (a few KiB) regardless of input size, so at 100 TB it is the
  * canonical "shrink-then-broadcast" shape: one shuffle of
  * `depth·width` partial counts, then a broadcast join against whatever
  * key set needs estimates.
  *
  * The hash family is the classic universal `((a·k + b) mod p) mod w`
  * (Cormen-style, p = 2^31 − 1) chosen because it is exactly expressible
  * in ANSI SQL — the DuckDB oracle replays the identical arithmetic, so
  * estimates (not just exact counts) are hash-compared cross-engine.
  * Keys must be non-negative (true for every id column in the testdata
  * contract); `a·k` stays far below Long overflow for any realistic id
  * (a < 2^22, k < 2^40).
  */
object CountMinSketch {
  /** p = 2^31 − 1 (Mersenne prime), the standard universal-hash modulus. */
  val P: Long = 2147483647L
  /** (a, b) per depth row — three independent hash functions. */
  val Salts: Seq[(Long, Long)] =
    Seq((1000003L, 12345L), (2000003L, 67890L), (3000017L, 13579L))

  def width: Int = 1024
  def depth: Int = Salts.size

  /** Bucket of `key` under hash row `i` — usable in any projection. */
  def bucket(key: Column, i: Int): Column = {
    val (a, b) = Salts(i)
    ((key * a + b) % P) % width
  }

  /** The sketch: one row per non-empty (i, bucket) cell with its count.
    * One shuffle, `depth · width` result rows max. */
  def build(rows: DataFrame, keyCol: String): DataFrame = {
    val cells = explode(array((0 until depth).map(i =>
      struct(lit(i).as("i"), bucket(col(keyCol), i).as("bucket"))): _*))
    rows.select(cells.as("c"))
      .groupBy(col("c.i").as("i"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for `keys` (any frame with `keyCol`): the min over
    * the depth rows of the key's bucket counts. The sketch side is tiny
    * by construction, so it is broadcast — the keys frame never
    * shuffles. Count-Min never under-estimates: `est >= true count`. */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String): DataFrame = {
    val withEst = (0 until depth).foldLeft(keys) { (acc, i) =>
      acc.join(
        broadcast(sketch.where(col("i") === i)
          .select(col("bucket").as(s"__b$i"), col("c").as(s"__c$i"))),
        bucket(col(keyCol), i) === col(s"__b$i"))
        .drop(s"__b$i")
    }
    withEst.withColumn("est",
      least((0 until depth).map(i => col(s"__c$i")): _*))
      .drop((0 until depth).map(i => s"__c$i"): _*)
  }
}
