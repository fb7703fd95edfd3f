package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reliability family (q194–q196): AUC/Brier/ECE against hand-computed
  * values on planted score/label sets (including the tie regime the
  * mid-rank form exists for), Kaplan–Meier against a hand-traced
  * censored cohort, BFS hops against a planted path + budget cutoff. */
class ReliabilitySpec extends SparkTestBase {
  import spark.implicits._

  private def scored(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("s", "y")

  test("q194: perfect separation gives AUC=1, reversed gives AUC=0") {
    // negatives at 100k/200k ppm, positives at 800k/900k ppm
    val perfect = scored(Seq((100000L, 0L), (200000L, 0L),
      (800000L, 1L), (900000L, 1L)))
    val g1 = Reliability.aucCalibrationOn(perfect).select("auc_ppm")
      .distinct().as[Long].collect()
    assert(g1.toSeq == Seq(1000000L))

    val reversed = scored(Seq((100000L, 1L), (200000L, 1L),
      (800000L, 0L), (900000L, 0L)))
    val g0 = Reliability.aucCalibrationOn(reversed).select("auc_ppm")
      .distinct().as[Long].collect()
    assert(g0.toSeq == Seq(0L))
  }

  test("q194: ties contribute exactly 1/2 via mid-ranks") {
    // one positive and one negative share s=500000: AUC = (1 + 0.5·1)/2?
    // hand: pairs = P×N = 2·2 = 4; concordant: (900k pos > 100k neg)=1,
    // (900k>500k neg)=1, (500k pos>100k neg)=1; tied: (500k pos,500k neg)
    // = 0.5 → AUC = 3.5/4 = 0.875
    val t = scored(Seq((100000L, 0L), (500000L, 0L),
      (500000L, 1L), (900000L, 1L)))
    val got = Reliability.aucCalibrationOn(t).select("auc_ppm")
      .distinct().as[Long].collect()
    assert(got.toSeq == Seq(875000L))
  }

  test("q194: Brier and ECE match hand arithmetic") {
    // s=1000000,y=1 → err 0; s=0,y=0 → err 0; s=500000,y=1 → (5e5)²
    // brier_micro = 25e10·1 /(3·1e6) ... = 250000000000 div 3000000 = 83333
    val t = scored(Seq((1000000L, 1L), (0L, 0L), (500000L, 1L)))
    val row = Reliability.aucCalibrationOn(t)
      .select("brier_micro", "ece_ppm").distinct().collect()
    assert(row.length == 1)
    assert(row(0).getLong(0) == 83333L)
    // bins: s=0 → bin0 (conf 0, acc 0, gap 0); s=500000 → bin5 (conf
    // 500000, acc 1000000, gap 500000); s=1000000 → clamped bin9 (conf
    // 1000000, acc 1000000, gap 0); ece = (1·0+1·500000+1·0) div 3 = 166666
    assert(row(0).getLong(1) == 166666L)
  }

  test("q194: bin table clamps s=1e6 into the top bin and reports gaps") {
    val t = scored(Seq((1000000L, 1L), (950000L, 0L), (50000L, 0L)))
    val bins = Reliability.aucCalibrationOn(t)
      .select("bin", "n_bin", "conf_ppm", "acc_ppm").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(bins.keySet == Set(0L, 9L))
    assert(bins(9L) == ((2L, 975000L, 500000L))) // 1e6 clamped in with 950k
    assert(bins(0L) == ((1L, 50000L, 0L)))
  }

  test("q195: hand-traced censored cohort") {
    // cohort: deaths at t=1 (2 of them), censor at t=1 (1), death at
    // t=3 (1), censor at t=5 (1). n=5.
    //   t=1: n_risk=5, d=2, c-d=1 → term = ln(3)-ln(5)
    //   t=3: n_risk=2, d=1       → term = ln(1)-ln(2)
    //   t=5: n_risk=1, d=0       → term 0, survival carries
    val t = Seq((1L, 1L), (1L, 1L), (1L, 0L), (3L, 1L), (5L, 0L))
      .toDF("t", "ev")
    val got = Reliability.kaplanMeierOn(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    def mln(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val t1 = mln(3) - mln(5)
    val t3 = mln(1) - mln(2)
    assert(got(1L) == ((5L, 2L, 1L, Some(t1))))
    assert(got(3L) == ((2L, 1L, 0L, Some(t1 + t3))))
    assert(got(5L) == ((1L, 0L, 1L, Some(t1 + t3))))
  }

  test("q195: risk set dying out yields NULL log-survival from that time on") {
    // everyone dies at t=2 → S=0 afterwards; the t=2 row itself is S=0
    val t = Seq((2L, 1L), (2L, 1L)).toDF("t", "ev")
    val got = Reliability.kaplanMeierOn(t).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 2L)
    assert(got(0).isNullAt(4))
  }

  test("q196: path-graph hops respect the round budget") {
    // path 0-1-2-...-9 from source 0: dist = index, budget 6 → nodes 7+
    // absent... budget reaches dist 6 → ids 0..6 present
    val knn = (0L to 8L).map(i => (i, i + 1, 1, 1.0))
      .toDF("vec_id", "neighbor_id", "rank", "sim")
    val got = Reliability.bfsOn(knn, Reliability.BfsRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 6L).map(i => i -> i).toMap)
  }

  test("q196: min over multiple routes wins (cycle)") {
    // cycle of 8: node 4 reachable in 4 either way; node 7 reachable in 1
    val edges = (0L to 7L).map(i => (i, (i + 1) % 8, 1, 1.0))
    val knn = edges.toDF("vec_id", "neighbor_id", "rank", "sim")
    val got = Reliability.bfsOn(knn, Reliability.BfsRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L,
      5L -> 3L, 6L -> 2L, 7L -> 1L))
  }

  test("q207: planted weighted graph — shortest paths beat direct edges") {
    import spark.implicits._
    // 1-2 w5, 2-3 w1, 1-3 w10 (dominated by 1-2-3 = 6), 3-4 w2;
    // 5-6 w7 unreachable from the min-id source
    val und = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L), (3L, 4L, 2L),
      (5L, 6L, 7L)).toDF("src", "dst", "w")
    val edges = und.unionByName(
      und.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val got = Reliability.ssspOn(edges, 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 8L))
  }

  test("q207: round budget bounds path LENGTH, later rounds still relax") {
    import spark.implicits._
    val und = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L)).toDF("src", "dst", "w")
    val edges = und.unionByName(
      und.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val r1 = Reliability.ssspOn(edges, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(3L) == 10L) // one round: only the direct edge
    val r2 = Reliability.ssspOn(edges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(3L) == 6L) // two rounds: the 1-2-3 relaxation lands
  }

  test("q194/q195/q196/q207 run on real sf0.001 testdata") {
    val dir = "/root/testdata/sf0.001"
    assert(Reliability.q194AucCalibration(spark, dir).count() > 0)
    assert(Reliability.q195KaplanMeier(spark, dir).count() > 0)
    assert(Reliability.q196BfsHops(spark, dir).count() > 0)
    assert(Reliability.q207SsspWeighted(spark, dir).count() > 0)
  }

  test("q234: PAV pools exactly the textbook violator block") {
    import spark.implicits._
    // rates by score: .2 .5 .3 .8 -> scores 2,3 pool to 8/20 = .4
    val rows = Seq((1L, 10, 2), (2L, 10, 5), (3L, 10, 3), (4L, 10, 8))
      .flatMap { case (s, n, p) =>
        Seq.fill(p)((s, true)) ++ Seq.fill(n - p)((s, false)) }
      .toDF("score", "pos")
    val got = Reliability.isotonicOn(spark, rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == (10L, 2L, 200000L))
    assert(got(2L) == (20L, 8L, 400000L) && got(3L) == (20L, 8L, 400000L))
    assert(got(4L) == (10L, 8L, 800000L))
  }

  test("q234: output rates are globally non-decreasing in score") {
    val dir = "/root/testdata/sf0.001"
    val rates = Reliability.q234IsotonicCalibration(spark, dir)
      .orderBy("score").collect().map(_.getLong(3))
    assert(rates.nonEmpty)
    rates.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, s"rate fell: $a -> $b")
      case _ =>
    }
  }

  test("q243: Murphy identity Brier = REL - RES + UNC, exact on bin-constant scores") {
    import spark.implicits._
    // bin0: score 50000, 1 of 4 positive; bin9: score 950000, 3 of 4
    // REL=40000, RES=62500, UNC=250000, Brier=227500 (hand-computed)
    val scored = (Seq((50000L, 1L)) ++ Seq.fill(3)((50000L, 0L)) ++
      Seq.fill(3)((950000L, 1L)) ++ Seq((950000L, 0L))).toDF("s", "y")
    val r = Reliability.brierDecompositionOn(scored).collect().head
    assert(r.getLong(0) == 8L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 500000L)
    assert(r.getLong(3) == 40000L, s"rel: $r")
    assert(r.getLong(4) == 62500L, s"res: $r")
    assert(r.getLong(5) == 250000L, s"unc: $r")
    assert(r.getLong(6) == 227500L, s"brier: $r")
    assert(r.getLong(3) - r.getLong(4) + r.getLong(5) == r.getLong(6))
  }

  test("q243: a calibrated-but-useless scorer has REL ~ 0 and RES = 0") {
    import spark.implicits._
    // every doc scored at the base rate 500000; half positive
    val scored = (Seq.fill(5)((500000L, 1L)) ++ Seq.fill(5)((500000L, 0L)))
      .toDF("s", "y")
    val r = Reliability.brierDecompositionOn(scored).collect().head
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L, s"$r")
    assert(r.getLong(6) == r.getLong(5), s"brier should equal UNC: $r")
  }

  test("q234: an already-isotonic input is returned unchanged") {
    import spark.implicits._
    val rows = Seq((1L, 4, 1), (2L, 4, 2), (3L, 4, 3))
      .flatMap { case (s, n, p) =>
        Seq.fill(p)((s, true)) ++ Seq.fill(n - p)((s, false)) }
      .toDF("score", "pos")
    val got = Reliability.isotonicOn(spark, rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted.toList
    // strictly increasing rates: no pooling, each block is one score
    assert(got == List((1L, 4L, 250000L), (2L, 4L, 500000L),
      (3L, 4L, 750000L)))
  }
}
