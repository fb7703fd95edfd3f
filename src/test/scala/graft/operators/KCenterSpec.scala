package graft.operators

import org.apache.spark.sql.functions._

class KCenterSpec extends graft.SparkTestBase {
  import spark.implicits._

  /** Three tight clusters far apart along distinct axes. */
  private def planted: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(140L)
    def around(base: Array[Float], id: Long) =
      (id, base.map(x => x + rnd.nextFloat() * 0.01f))
    val a = Array(100f, 0f, 0f)
    val b = Array(0f, 100f, 0f)
    val c = Array(0f, 0f, 100f)
    (0L until 30L).map { i =>
      around(Seq(a, b, c)(i.toInt % 3), i)
    }
  }

  test("k=3 on three planted clusters picks one exemplar per cluster") {
    val df = planted.toDF("vec_id", "embedding")
    val picks = KCenter.select(df, "vec_id", "embedding", 3)
      .select("vec_id").as[Long].collect().toSet
    // cluster membership = id % 3 by construction
    assert(picks.map(_ % 3) == Set(0L, 1L, 2L), s"picks $picks miss a cluster")
  }

  test("radius curve is non-increasing from rank 2 and zero at rank 1") {
    val df = planted.toDF("vec_id", "embedding")
    val rows = KCenter.select(df, "vec_id", "embedding", 6)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    assert(rows.head == (1, 0L))
    val radii = rows.tail.map(_._2)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"radius curve not non-increasing: ${radii.toSeq}")
    // the first jump must cross between clusters (distance ~141)
    assert(radii.head > 100L * 1000000L)
  }

  test("selection is invariant to partitioning and row order") {
    val df = planted.toDF("vec_id", "embedding")
    val a = KCenter.select(df, "vec_id", "embedding", 5)
      .orderBy("rank").collect().toSeq
    val b = KCenter.select(df.orderBy(rand(9)).repartition(7),
        "vec_id", "embedding", 5)
      .orderBy("rank").collect().toSeq
    assert(a == b)
  }

  test("transformed + cached input selects like the materialized equivalent") {
    // rows collected off a transform()+cache() plan can surface
    // GenericArrayData-backed seqs — the vecLit path must not care
    val df = planted.toDF("vec_id", "embedding")
    // int literal promotes the element type to DOUBLE — the dtype the
    // ScaleSmoke blow-up produces; KCenter must accept both
    val transformed = df.select(col("vec_id"),
      transform(col("embedding"), x => x * (lit(1) * lit(1.0))).as("embedding")).cache()
    try {
      val a = KCenter.select(transformed, "vec_id", "embedding", 4)
        .orderBy("rank").collect().toSeq
      val b = KCenter.select(df, "vec_id", "embedding", 4)
        .orderBy("rank").collect().toSeq
      assert(a == b)
    } finally { transformed.unpersist(); () }
  }

  test("duplicate-only remainder stops early; empty input yields empty") {
    val dup = Seq((1L, Array(1f, 1f)), (2L, Array(1f, 1f)), (3L, Array(5f, 5f)))
      .toDF("vec_id", "embedding")
    val rows = KCenter.select(dup, "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getLong(1)))
    // after picking 1 and 3, only exact duplicates of centers remain
    assert(rows.toSeq == Seq((1, 1L), (2, 3L)))
    val empty = KCenter.select(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      "vec_id", "embedding", 4)
    assert(empty.count() == 0)
  }
}
