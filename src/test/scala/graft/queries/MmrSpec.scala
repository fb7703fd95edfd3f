package graft.queries

import graft.SparkTestBase

/** q222 MMR: planted geometry where the near-duplicate of pick #1 must
  * LOSE round 2 to a slightly-less-relevant but diverse vector (the
  * behavior that distinguishes MMR from plain top-k), plus exact
  * equality with an independent driver replica of the greedy. */
class MmrSpec extends SparkTestBase {
  import spark.implicits._

  // q = e0; v1 top hit; v2 = near-dup of v1 (rel 2nd); v3 diverse
  // (rel 3rd, close behind); v4 orthogonal filler
  private val vecs: Seq[(Long, Array[Float])] = Seq(
    0L -> Array(1f, 0f, 0f, 0f),
    1L -> Array(10f, 1f, 0f, 0f),
    2L -> Array(10f, 1.05f, 0f, 0f),
    3L -> Array(10f, 0f, 1.2f, 0f),
    4L -> Array(0f, 0f, 0f, 1f))

  private def cosE4(a: Array[Float], b: Array[Float]): Long = {
    def dot(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
    math.round(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      * 10000)
  }

  /** Independent greedy replica on spec-side double cosines. */
  private def replica: Seq[(Long, Long, Long)] = {
    val q = vecs.head._2
    val cands = vecs.tail.map { case (id, v) => (id, v, cosE4(q, v)) }
      .sortBy { case (id, _, sim) => (-sim, id) }.take(TextVector.MmrCandidates)
    var selected = Vector.empty[(Long, Long)]
    var remaining = cands
    while (selected.size < TextVector.MmrK && remaining.nonEmpty) {
      val scored = remaining.map { case (id, v, sim) =>
        val red =
          if (selected.isEmpty) 0L
          else selected.map { case (sid, _) =>
            cosE4(v, vecs.find(_._1 == sid).get._2)
          }.max
        (id, 7 * sim - 3 * red)
      }
      val (pick, score) = scored.minBy { case (id, sc) => (-sc, id) }
      selected :+= (pick, score)
      remaining = remaining.filterNot(_._1 == pick)
    }
    selected.zipWithIndex.map { case ((id, sc), i) => (i + 1L, id, sc) }
  }

  test("q222: engine greedy equals the driver replica exactly") {
    val e = vecs.toDF("vec_id", "embedding")
    val got = TextVector.mmrOn(e).as[(Long, Long, Long)].collect().toSeq
    assert(got == replica, s"engine $got != replica $replica")
  }

  test("q222: the near-dup loses round 2 to the diverse runner-up") {
    val e = vecs.toDF("vec_id", "embedding")
    val got = TextVector.mmrOn(e).as[(Long, Long, Long)].collect()
      .map { case (r, id, _) => r -> id }.toMap
    // relevance order is 1 > 2 > 3, but rank 2 must go to the DIVERSE
    // vector 3 — vector 2 is a near-clone of the already-picked 1
    assert(cosE4(vecs.head._2, vecs(2)._2) > cosE4(vecs.head._2, vecs(3)._2),
      "fixture broke: v2 must be more relevant than v3")
    assert(got(1L) == 1L && got(2L) == 3L && got(3L) == 2L, s"$got")
  }
}
