package graft.queries

import graft.SparkTestBase

/** Ranking family (q208 PPR, q209 TextRank): planted co-occurrence
  * graphs with hand-derivable structure — symmetric pair, hub
  * dominance, self-loop/singleton exclusion — plus real-testdata
  * smokes. The integer-recurrence exactness itself is proven in
  * PageRankSpec against an independent driver replica. */
class RankingSpec extends SparkTestBase {
  import spark.implicits._

  test("q209: symmetric two-token doc ranks both tokens equally; singletons absent") {
    // "a b a": und (a,b) w=2 both ways; "c c" self-loop only -> c absent;
    // "d" single token -> no pairs
    val docs = Seq((1L, "a b a"), (2L, "c c"), (3L, "d"))
      .toDF("doc_id", "text")
    val got = Ranking.textrankOn(docs).as[(String, Long)].collect().toMap
    assert(got.keySet == Set("a", "b"))
    assert(got("a") == got("b"))
  }

  test("q209: co-occurrence hub outranks spokes; strong tie beats weak tie") {
    // "x y x y y z": und (x,y) w=3, (y,z) w=1 -> y hub; x > z by tie weight
    val docs = Seq((1L, "x y x y y z")).toDF("doc_id", "text")
    val got = Ranking.textrankOn(docs).as[(String, Long)].collect().toMap
    assert(got("y") > got("x") && got("x") > got("z"), s"ordering: $got")
  }

  test("q208/q209 run on real sf0.001 testdata; PPR seed holds the most mass") {
    val dir = "/root/testdata/sf0.001"
    val ppr = Ranking.q208Ppr(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(ppr.nonEmpty)
    val seed = ppr.keys.min // seed = lexicographically smallest node
    assert(ppr(seed) == ppr.values.max,
      s"restart node must hold the most mass: $ppr")
    assert(Ranking.q209Textrank(spark, dir).count() > 0)
  }

  test("q219: G2 matches a driver replica; bound pair beats frequent-but-independent") {
    // (x,y): 10 exclusive co-occurrences — a true collocation.
    // (p,q): 5 co-occurrences but p and q also pair elsewhere.
    val docs = (Seq.fill(10)("x y") ++ Seq.fill(5)("p q") ++
      Seq.fill(5)("p r") ++ Seq.fill(5)("s q"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Ranking.llrCollocationsOn(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

    // independent driver replica of the micro-nat G2 decomposition
    def mn(v: Long) = math.round(math.log(v.toDouble) * 1e6)
    def g2(k11: Long, r: Long, c: Long, n: Long): Long = {
      def term(k: Long, row: Long, col: Long) =
        if (k > 0) k * (mn(k) + mn(n) - mn(row) - mn(col)) else 0L
      2 * (term(k11, r, c) + term(r - k11, r, n - c) +
        term(c - k11, n - r, c) + term(n - r - c + k11, n - r, n - c))
    }
    assert(got(("x", "y")) == (10L, g2(10, 10, 10, 25)), s"xy: $got")
    assert(got(("p", "q")) == (5L, g2(5, 10, 10, 25)), s"pq: $got")
    assert(got(("x", "y"))._2 > got(("p", "q"))._2,
      "exclusive collocation must outscore the independent pair")
    // min-count filter: every emitted pair has k11 >= LlrMinPairCount
    assert(got.values.forall(_._1 >= Ranking.LlrMinPairCount))
  }
}
