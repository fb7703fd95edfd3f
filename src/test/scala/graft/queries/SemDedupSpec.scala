package graft.queries

import graft.SparkTestBase

/** Behavioral invariants for q137 SemDeDup and q136 skyline beyond the
  * DuckDB oracle equivalence the driver checks. */
class SemDedupSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q137: kept flags match a brute-force SemDeDup over collected vectors") {
    import org.apache.spark.sql.functions._
    val raw = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val cluster = raw.map { case (id, v) =>
      id -> (v.indexOf(v.max) + 1) // argmax dim, 1-based like array_position
    }.toMap
    val wantDropped = (for {
      (a, av) <- raw; (b, bv) <- raw
      if a < b && cluster(a) == cluster(b) &&
        cosine(av, bv) >= PipelineQueries.SemDedupTau
    } yield b).toSet
    val got = PipelineQueries.q137SemDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(got.length == raw.length, "one decision row per vector")
    got.foreach { case (id, cl, kept) =>
      assert(cl == cluster(id), s"cluster mismatch for $id")
      assert(kept == !wantDropped.contains(id), s"kept mismatch for $id")
    }
    assert(got.count(!_._3) == wantDropped.size)
  }

  test("q136: frontier is non-empty, mutually non-dominating, and globally undominated") {
    val all = graft.sources.Tables.part(spark, dir)
      .select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val front = Analytics.q136Skyline(spark, dir)
      .collect().map(r => r.getLong(0)).toSet
    assert(front.nonEmpty)
    val want = all.filter { case (_, x, y) =>
      !all.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.map(_._1).toSet
    assert(front == want)
  }
}
