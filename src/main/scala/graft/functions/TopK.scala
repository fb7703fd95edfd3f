package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed [[Aggregator]]: keeps the k largest
  * (score, payload) pairs per group in a fixed-size binary min-heap,
  * emitted as a (score, payload)-descending sequence.
  *
  * This is the scale-correct replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k` idiom:
  * the window form shuffles and SORTS every input row by (g, s) —
  * at 100 TB that is the whole corpus through one exchange for an
  * output of k rows per group. As an aggregate it combines map-side
  * (ObjectHashAggregate partial → merge), so each partition
  * contributes at most k pairs per group to the shuffle and nothing
  * is ever globally sorted; the heap makes each row O(log k) and the
  * partial buffer a flat primitive `Array[Long]` (no boxing on the
  * merge path — the buffer crosses the wire as an unsafe LongArray,
  * same discipline as [[SimHash]]'s vote buffer).
  *
  * Determinism: the order is the TOTAL lexicographic order on
  * (score, payload) — callers wanting reproducible output use a
  * unique payload (the q279 contract), exactly as they would have to
  * tie-break the window form.
  *
  * Buffer layout: slot 0 is the live pair count n ≤ k; pair i sits at
  * (1 + 2i, 2 + 2i). The root (slot 1) is the MINIMUM — the pair the
  * next better row evicts. */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]] {
  require(k >= 1 && k <= (1 << 20),
    s"graft topk needs 1 <= k <= ${1 << 20}, got $k")

  override def zero: Array[Long] = Array(0L)

  /** pair i < pair j under (score, payload) lexicographic order. */
  private def less(b: Array[Long], i: Int, j: Int): Boolean = {
    val si = b(1 + 2 * i); val sj = b(1 + 2 * j)
    si < sj || (si == sj && b(2 + 2 * i) < b(2 + 2 * j))
  }

  private def swap(b: Array[Long], i: Int, j: Int): Unit = {
    var t = b(1 + 2 * i); b(1 + 2 * i) = b(1 + 2 * j); b(1 + 2 * j) = t
    t = b(2 + 2 * i); b(2 + 2 * i) = b(2 + 2 * j); b(2 + 2 * j) = t
  }

  /** Push (s, p), evicting the minimum when full; returns the buffer
    * (grown to full capacity on first use). */
  private def push(buf: Array[Long], s: Long, p: Long): Array[Long] = {
    var b = buf
    val n = b(0).toInt
    if (n < k) {
      if (b.length < 1 + 2 * k) {
        val nb = new Array[Long](1 + 2 * k)
        System.arraycopy(b, 0, nb, 0, b.length)
        b = nb
      }
      b(1 + 2 * n) = s; b(2 + 2 * n) = p; b(0) = n + 1
      var i = n // sift up
      while (i > 0 && less(b, i, (i - 1) / 2)) {
        swap(b, i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (s > b(1) || (s == b(1) && p > b(2))) {
      b(1) = s; b(2) = p
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < n && less(b, l, m)) m = l
        if (r < n && less(b, r, m)) m = r
        if (m == i) done = true else { swap(b, i, m); i = m }
      }
    }
    b
  }

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] =
    push(buf, in._1, in._2)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var acc = a
    val n = b(0).toInt
    var i = 0
    while (i < n) {
      acc = push(acc, b(1 + 2 * i), b(2 + 2 * i))
      i += 1
    }
    acc
  }

  override def finish(b: Array[Long]): Seq[(Long, Long)] = {
    val n = b(0).toInt
    (0 until n).map(i => (b(1 + 2 * i), b(2 + 2 * i)))
      .sortBy { case (s, p) => (-s, -p) }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
