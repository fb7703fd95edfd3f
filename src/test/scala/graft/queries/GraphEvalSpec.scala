package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph/eval family (q178–q180): LPA against a hand-traced planted
  * topology (one component, two communities), mutual-kNN against the
  * reciprocity rule, nDCG against a driver-side replica on real
  * testdata. */
class GraphEvalSpec extends SparkTestBase {
  import spark.implicits._

  /** Undirected edge list → the (vec_id, neighbor_id, rank, sim) shape
    * [[GraphEval.lpaOn]] consumes (rank/sim unused by LPA). */
  private def knnFrame(edges: Seq[(Long, Long)]): DataFrame =
    edges.map { case (a, b) => (a, b, 1, 1.0) }
      .toDF("vec_id", "neighbor_id", "rank", "sim")

  test("q178: bridged triangles stay one component but split into two communities") {
    // 1-2-3 triangle, 4-5-6 triangle, single bridge 3-4. Hand-traced
    // synchronous LPA (min-label ties): stable after 3 rounds at
    // {1,2,3} -> 1 and {4,5,6} -> 3.
    val g = knnFrame(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)))
    val got = GraphEval.lpaOn(g, GraphEval.LpaRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("q178: a clique converges to its minimum id") {
    val g = knnFrame(for {
      a <- 10L to 14L; b <- (a + 1) to 14L
    } yield (a, b))
    val got = GraphEval.lpaOn(g, GraphEval.LpaRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(10L))
    assert(got.keySet == (10L to 14L).toSet)
  }

  test("q179: only reciprocated edges survive, emitted once in a<b form") {
    // 1<->2 mutual; 1->3 unreciprocated; 3<->4 mutual; 5->1 unreciprocated
    val knn = Seq(
      (1L, 2L, 1, 0.9), (2L, 1L, 1, 0.9),
      (1L, 3L, 2, 0.5),
      (3L, 4L, 1, 0.8), (4L, 3L, 1, 0.8),
      (5L, 1L, 1, 0.4)
    ).toDF("vec_id", "neighbor_id", "rank", "sim")
    val got = GraphEval.mutualOn(knn).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 0.9), (3L, 4L, 0.8)))
  }

  test("q180: nDCG matches a driver-side replica on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val truth = TextVector.q29AnnBruteForce(spark, dir)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    val labels = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val poolOf = labels.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def w(r: Int): Long = math.round(1e6 * math.log(2.0) / math.log(r + 1.0))
    val expected = truth.groupBy(_._1).map { case (q, rows) =>
      val ql = labels(q)
      val dcg = rows.map { case (_, n, r) =>
        if (labels(n) == ql) w(r) else 0L }.sum
      val icap = math.min(poolOf(ql) - 1, GraphEval.NdcgK.toLong)
      val idcg = (1L to icap).map(r => w(r.toInt)).sum
      val ndcg = if (idcg == 0) None else Some(dcg * 1000000L / idcg)
      q -> ((dcg, idcg, ndcg))
    }
    val got = GraphEval.q180Ndcg(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val q = r.getLong(0)
      val (dcg, idcg, ndcg) = expected(q)
      assert(r.getLong(3) == dcg, s"dcg mismatch for query $q")
      assert(r.getLong(4) == idcg, s"idcg mismatch for query $q")
      assert((if (r.isNullAt(5)) None else Some(r.getLong(5))) == ndcg,
        s"ndcg mismatch for query $q")
    }
    assert(got.length == expected.size)
  }

  test("q185: nearest-benchmark report matches a driver-side brute force on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val bench = vecs.filter(_._1 < GraphEval.BenchIdCut)
    val corpus = vecs.filter(_._1 >= GraphEval.BenchIdCut)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = corpus.map { case (id, v) =>
      val (bid, s) = bench.map { case (b, bv) => (b, cos(v, bv)) }
        .minBy { case (b, s) => (-s, b) }
      id -> ((bid, s >= GraphEval.ContamTau))
    }.toMap
    val got = GraphEval.q185SemanticContamination(spark, dir).collect()
    assert(got.length == corpus.length)
    got.foreach { r =>
      val (bid, flag) = expected(r.getLong(0))
      assert(r.getLong(1) == bid && r.getBoolean(3) == flag,
        s"mismatch for vec ${r.getLong(0)}")
    }
    // the flag discriminates on this data: both values present
    assert(got.map(_.getBoolean(3)).toSet.size == 2,
      "threshold should split the corpus on the test data")
  }
}
