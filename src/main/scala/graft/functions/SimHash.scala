package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** 64-bit SimHash as a typed Spark [[Aggregator]] (registered via
  * `functions.udaf`): consumes one 64-bit token hash per row, keeps a
  * 64-lane vote buffer, emits the majority-sign bit pattern.
  *
  * This is the classic Charikar similarity hash: documents whose token
  * multisets mostly overlap land at small Hamming distance. A single
  * map-side-combinable aggregation — no all-pairs work, scales linearly.
  */
object SimHash extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(votes: Array[Int], tokenHash: Long): Array[Int] = {
    var j = 0
    while (j < 64) {
      if (((tokenHash >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
      j += 1
    }
    votes
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(votes: Array[Int]): Long = {
    var bits = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) >= 0) bits |= (1L << j)
      j += 1
    }
    bits
  }

  /** Primitive-array expression encoder: the buffer serializes as a Spark
    * `ArrayType(IntegerType)` (contiguous unsafe array), not Java object
    * serialization — this runs on every partial-merge of the aggregation,
    * so it's on the hot path. */
  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
