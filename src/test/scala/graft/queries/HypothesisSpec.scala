package graft.queries

import graft.SparkTestBase
import graft.operators.DistCumSum

class HypothesisSpec extends SparkTestBase {
  import spark.implicits._

  private def spine(s1: Seq[Long], s2: Seq[Long]) = {
    val hist = (s1.map(v => (v, 1L, 0L)) ++ s2.map(v => (v, 0L, 1L)))
      .toDF("v", "c1", "c2")
      .groupBy("v")
      .agg(org.apache.spark.sql.functions.sum("c1").as("c1"),
        org.apache.spark.sql.functions.sum("c2").as("c2"))
    DistCumSum.overDomainAll(hist, "v", Seq("c1" -> "f1", "c2" -> "f2"))
  }

  test("q217: KS distance is the exact max CDF gap") {
    // A = {1,2,3,4}, B = {3,4,5,6}: F_A - F_B peaks at v=2 (2/4 - 0/4)
    val got = Hypothesis.ksOn(spine(Seq(1, 2, 3, 4), Seq(3, 4, 5, 6)), "a", "b")
      .collect().head
    assert(got.getString(0) == "a" && got.getString(1) == "b")
    assert(got.getLong(2) == 4 && got.getLong(3) == 4)
    assert(got.getLong(4) == 500000L, s"D != 1/2: $got")
  }

  test("q217: identical samples give D = 0; disjoint give D = 1") {
    val same = Hypothesis.ksOn(spine(Seq(1, 2, 5), Seq(1, 2, 5)), "a", "b")
      .collect().head
    assert(same.getLong(4) == 0L)
    val disj = Hypothesis.ksOn(spine(Seq(1, 2), Seq(7, 8)), "a", "b")
      .collect().head
    assert(disj.getLong(4) == 1000000L)
  }

  test("q218: doubled midranks handle ties exactly") {
    // A = {1,3}, B = {3,5}. Pooled sorted: 1,3,3,5 -> ranks 1, 2.5, 2.5, 4.
    // R1 = 1 + 2.5 = 3.5 -> R1x2 = 7; U1x2 = 7 - 2*3 = 1; AUC = 1/8.
    val got = Hypothesis
      .mannWhitneyOn(spine(Seq(1, 3), Seq(3, 5)), "a", "b").collect().head
    assert(got.getLong(2) == 2 && got.getLong(3) == 2)
    assert(got.getLong(4) == 1L, s"U1x2: $got")
    assert(got.getLong(5) == 125000L, s"AUC ppm: $got")
  }

  test("q218: stochastic dominance gives AUC = 1; symmetry sums to 1") {
    val dom = Hypothesis.mannWhitneyOn(spine(Seq(9, 10), Seq(1, 2)), "a", "b")
      .collect().head
    assert(dom.getLong(4) == 8L && dom.getLong(5) == 1000000L)
    val ab = Hypothesis.mannWhitneyOn(spine(Seq(1, 4), Seq(2, 3)), "a", "b")
      .collect().head
    val ba = Hypothesis.mannWhitneyOn(
      spine(Seq(2, 3), Seq(1, 4)), "b", "a").collect().head
    // U1(A) + U1(B) = n1*n2 (here 4): 2x doubled = 8
    assert(ab.getLong(4) + ba.getLong(4) == 8L)
  }

  test("q216: DiD contrast is exact over the common denominator") {
    // treat (arm 1): u1 pre 100 post 400 -> delta 300, n_t = 1
    // ctrl  (arm 0): u2 pre 200 post 250; u3 pre 0 post 50 -> delta 100, n_c = 2
    // DiD = 300/1 - 100/2 = 250 -> 250e6 micro-cents
    val e = Seq(
      (1L, 1, false, 100L), (1L, 1, true, 400L),
      (2L, 0, false, 200L), (2L, 0, true, 250L), (3L, 0, true, 50L))
      .toDF("user_id", "arm", "post", "cents")
    val got = Hypothesis.didOn(e).collect().head
    assert(got.getLong(0) == 1 && got.getLong(1) == 2)
    assert(got.getLong(2) == 100L && got.getLong(3) == 400L)
    assert(got.getLong(4) == 200L && got.getLong(5) == 300L)
    assert(got.getLong(6) == 250000000L, s"DiD: $got")
  }

  test("q223: Welch t2 and Satterthwaite df match the hand computation") {
    // A = {1..5}: mean 3, s2 = 2.5; B = {2,4,6,8}: mean 5, s2 = 20/3.
    // t = -2 / sqrt(2.5/5 + 20/12) -> t2 = 1.846154; nu = 4.74941.
    // Staged: md_ppm = -2000000, v1u+v2u = 500000+1666666 = 2166666,
    // t2_ppm = 4e12 div 2166666 = 1846154.
    val df = (Seq(1L, 2L, 3L, 4L, 5L).map((true, _)) ++
      Seq(2L, 4L, 6L, 8L).map((false, _))).toDF("a", "v")
    val got = Hypothesis.welchOn(df, "a", "b").collect().head
    assert(got.getLong(2) == 5 && got.getLong(3) == 4)
    assert(got.getLong(4) == -2000000L, s"mdiff: $got")
    assert(got.getLong(5) == 1846154L, s"t2_ppm: $got")
    assert(got.getLong(6) == 4749L, s"df_milli: $got")
  }

  test("q223: equal means give t2 = 0; sign flips with direction") {
    val eq = (Seq(1L, 5L).map((true, _)) ++ Seq(2L, 4L).map((false, _)))
      .toDF("a", "v")
    val g = Hypothesis.welchOn(eq, "a", "b").collect().head
    assert(g.getLong(4) == 0L && g.getLong(5) == 0L)
    val lt = (Seq(1L, 2L).map((true, _)) ++ Seq(8L, 9L).map((false, _)))
      .toDF("a", "v")
    assert(Hypothesis.welchOn(lt, "a", "b").collect().head.getLong(4) < 0)
  }

  test("q224: ANOVA F matches the hand computation, trunc-quantized") {
    // groups a={1,2,3} b={2,4} c={6,6}: term = 12+18+72 = 102,
    // ssb = 102 - 576 div 7 = 20, ssw = 106 - 102 = 4,
    // F_ppm = 20*4*1e6 div (4*2) = 10_000_000 (float F = 9.857).
    val e = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(2L, 4L).map(("b", _)) ++
      Seq(6L, 6L).map(("c", _))).toDF("g", "c")
    val got = Hypothesis.anovaOn(e).collect().head
    assert(got.getLong(0) == 3 && got.getLong(1) == 7)
    assert(got.getLong(2) == 20L && got.getLong(3) == 4L, s"ss: $got")
    assert(got.getLong(4) == 10000000L, s"F: $got")
  }

  test("q237: BH rejects the true shifts and keeps the identical pair") {
    // A and B identical (D=0 -> p capped at 1e6); C disjoint from both
    // (D=1, n=20 each -> p_micro = round(2e6 * e^-20) = 0).
    // BH at alpha=.05, m=3: ranks 1,2 pass (0 <= 50000*i), rank 3
    // fails (1e6*3 > 150000) -> k* = 2.
    val rows = (Seq.fill(20)(("a", 1L)) ++ Seq.fill(20)(("b", 1L)) ++
      Seq.fill(20)(("c", 100L))).toDF("source", "v")
    val got = Hypothesis.bhFdrOn(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(5), r.getBoolean(7))).toMap
    assert(got(("a", "c")) == (0L, true), s"$got")
    assert(got(("b", "c")) == (0L, true), s"$got")
    assert(got(("a", "b")) == (1000000L, false), s"$got")
  }

  test("q237: all-identical sources reject nothing") {
    val rows = (Seq.fill(10)(("a", 5L)) ++ Seq.fill(10)(("b", 5L)) ++
      Seq.fill(10)(("c", 5L))).toDF("source", "v")
    val got = Hypothesis.bhFdrOn(rows).collect()
    assert(got.length == 3 && got.forall(!_.getBoolean(7)))
  }

  test("q250: perfect agreement, reversal, and tie-cancel hit exact tau") {
    def tau(cells: (Long, Long)*): Long =
      Hypothesis.kendallOn(cells.toDF("xa", "yb")).collect().head.getLong(3)
    assert(tau((0L, 0L), (1L, 1L), (2L, 2L)) == 1000L)
    assert(tau((0L, 2L), (1L, 1L), (2L, 0L)) == -1000L)
    // 2x2 unit grid: one concordant, one discordant, four tie pairs
    assert(tau((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)) == 0L)
  }

  test("q250: duplicated rows scale pair counts but not tau") {
    val rows = Seq((0L, 0L), (1L, 1L), (2L, 2L)).flatMap(Seq.fill(5)(_))
      .toDF("xa", "yb")
    val r = Hypothesis.kendallOn(rows).collect().head
    assert(r.getLong(0) == 15L)
    assert(r.getLong(1) == 75L && r.getLong(2) == 0L) // 3 cell pairs x 25
    assert(r.getLong(3) == 1000L, s"$r")
  }

  test("q224: identical group means give ssb ~ 0") {
    val e = (Seq(1L, 3L).map(("a", _)) ++ Seq(2L, 2L).map(("b", _)))
      .toDF("g", "c")
    val got = Hypothesis.anovaOn(e).collect().head
    assert(got.getLong(2) == 0L && got.getLong(4) == 0L, s"$got")
  }

  test("q261: Levene F on the deviations matches the hand computation") {
    // a = {0,0,10,10}: mean 5 -> z = {5,5,5,5}; b = {4,6,4,7}: mean 5.25
    // -> z = |c*1e6 - 5250000| // 1e6 = {1,0,1,1}.
    // ANOVA on z: term = 100 + 2 = 102, ssb = 102 - 529 div 8 = 36,
    // ssw = 103 - 102 = 1, F_ppm = 36*6*1e6 div 1 = 216000000.
    val e = (Seq(0L, 0L, 10L, 10L).map(("a", _)) ++
      Seq(4L, 6L, 4L, 7L).map(("b", _))).toDF("g", "c")
    val got = Hypothesis.leveneOn(e).collect().head
    assert(got.getLong(0) == 2 && got.getLong(1) == 8)
    assert(got.getLong(2) == 36L, s"ssb: $got")
    assert(got.getLong(3) == 1L, s"ssw: $got")
    assert(got.getLong(4) == 216000000L, s"f_ppm: $got")
  }

  test("q259: Cliff's delta derives exactly from the doubled U and buckets correctly") {
    val got = Hypothesis.q259CliffsDelta(spark, "/root/testdata/sf0.001")
      .collect().head
    val (n1, n2) = (got.getLong(2), got.getLong(3))
    val delta = got.getLong(4)
    assert(delta >= -1000000L && delta <= 1000000L)
    val mag = got.getString(5)
    val expectMag =
      if (math.abs(delta) < Hypothesis.CliffSmallPpm) "negligible"
      else if (math.abs(delta) < Hypothesis.CliffMediumPpm) "small"
      else if (math.abs(delta) < Hypothesis.CliffLargePpm) "medium"
      else "large"
    assert(mag == expectMag, s"bucket: $got")
    // cross-check against q218's published AUC: delta = 2*AUC - 1 up to
    // the documented independent ppm truncations (within 2 ppm)
    val mw = Hypothesis.q218MannWhitney(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(math.abs((2 * mw.getLong(5) - 1000000L) - delta) <= 2,
      s"delta=$delta auc=${mw.getLong(5)}")
    assert(n1 > 0 && n2 > 0)
  }
}
