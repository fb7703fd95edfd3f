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
}
