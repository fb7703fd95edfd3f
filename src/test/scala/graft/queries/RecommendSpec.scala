package graft.queries

import graft.SparkTestBase

/** Recommend family (q206 item-item CF): hand-computed planted baskets,
  * duplicate-row idempotence (membership is binary), and the
  * squared-cosine integer arithmetic. */
class RecommendSpec extends SparkTestBase {
  import spark.implicits._

  test("q206: hand-computed basket co-occurrence and squared cosine") {
    // b1:{1,2,3} b2:{1,2} b3:{2,3} b4:{1,2}; plus a duplicate (b4,1) row
    // that must NOT inflate counts (binary membership).
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L),
      (4L, 1L), (4L, 2L), (4L, 1L)).toDF("basket", "item")
    val got = Recommend.itemCfOn(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(got.size == 3)
    // c1=3 c2=4 c3=2; cooc(1,2)=3 (1,3)=1 (2,3)=2
    val p12 = got((1L, 2L))
    assert(p12.getLong(2) == 3L && p12.getLong(3) == 3L && p12.getLong(4) == 4L)
    assert(p12.getLong(5) == 9L * 1000000L / 12L) // 750000
    val p13 = got((1L, 3L))
    assert(p13.getLong(2) == 1L && p13.getLong(5) == 1000000L / 6L) // 166666
    val p23 = got((2L, 3L))
    assert(p23.getLong(2) == 2L && p23.getLong(5) == 4L * 1000000L / 8L) // 500000
  }

  test("q206: top-k ordering is (cos2 desc, cooc desc, item_a, item_b)") {
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L),
      (4L, 1L), (4L, 2L)).toDF("basket", "item")
    val order = Recommend.itemCfOn(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(order.toSeq == Seq((1L, 2L), (2L, 3L), (1L, 3L)))
  }
}
