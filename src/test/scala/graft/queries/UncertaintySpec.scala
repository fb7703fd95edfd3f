package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Uncertainty family (q199–q200) + the q198 layout audit: BLB on a
  * constant corpus (interval must collapse to the point), Poisson
  * threshold construction, CUPED against a fully hand-computed 4-user
  * experiment, Morton interleave bit-exactness, and the semantic claim
  * of the layout audit on real data (Z-order boxes ≪ insertion-order
  * boxes). */
class UncertaintySpec extends SparkTestBase {
  import spark.implicits._

  test("Poisson(1) thresholds are the exact CDF snap, monotone, 6 entries") {
    val t = Uncertainty.PoissonThresholds
    assert(t.size == 6)
    assert(t == t.sorted)
    assert(t.head == math.floor(math.exp(-1.0) * 4294967296.0).toLong)
    // cum through k=5 covers ~99.994% of the mass
    assert(t.last > (0.9994 * 4294967296.0).toLong)
  }

  test("q199: constant corpus collapses the interval to the point") {
    val base = (1L to 64L).map(k => (k, 5000L, k % 4))
      .toDF("k", "cents", "subset")
    val got = Uncertainty.blbOn(base).collect()
    assert(got.length == 4)
    got.foreach { r =>
      assert(r.getLong(2) == 5000L) // mean
      assert(r.getLong(3) == 5000L) // lo
      assert(r.getLong(4) == 5000L) // hi
      assert(r.getLong(5) == 5000L && r.getLong(6) == 5000L) // global CI
    }
  }

  test("q199: replicate interval stays within the data range and brackets the mean") {
    val base = (1L to 200L).map(k => (k, 1000L + (k % 7) * 300L, k % 8))
      .toDF("k", "cents", "subset")
    val got = Uncertainty.blbOn(base).collect()
    assert(got.length == 8)
    got.foreach { r =>
      val (mean, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo <= hi)
      assert(lo >= 1000L && hi <= 1000L + 6 * 300L)
      // the 10–90% band of bootstrap means must cover the subset mean
      assert(lo <= mean && mean <= hi,
        s"subset ${r.getLong(0)}: [$lo,$hi] excludes mean $mean")
    }
  }

  test("q200: hand-computed 4-user experiment (theta, adjustment, z, VR)") {
    // arm0: (100,200),(200,320); arm1: (120,250),(180,310)
    // pooled: n=4 sx=600 sy=1080 sxx=96800 sxy=169800
    //  θ_ppm = (4·169800−600·1080)·10⁶ div (4·96800−600²) = 31200·10⁶ div 27200
    //        = 1147058 ; x̄ = 150
    // adj (y − θ(x−x̄) div 10⁶, trunc toward 0): 257, 263, 284, 276
    // arm0: mean 260 var 18 ; arm1: mean 280 var 32
    // effect = 20 ; z = 20/√(18/2+32/2) = 20/5 = 4 → 4000 milli
    // VR = 10⁶ − (4·292050−1080²)·10⁶ div (4·301000−1080²)
    //    = 10⁶ − 1800·10⁶ div 37600 = 952128
    val perUser = Seq(
      (1L, 100L, 200L, 0), (2L, 200L, 320L, 0),
      (3L, 120L, 250L, 1), (4L, 180L, 310L, 1)
    ).toDF("user_id", "x", "y", "arm")
    val got = Uncertainty.cupedOn(perUser).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(got(0).getLong(1) == 2L)       // n_users
    assert(got(0).getLong(2) == 260L)     // mean_post arm0 = (200+320)/2
    assert(got(0).getLong(3) == 260L)     // mean_adj arm0
    assert(got(0).getLong(4) == 18L)      // var_adj arm0
    assert(got(0).getLong(5) == 1147058L) // theta_ppm
    assert(got(0).getLong(6) == 150L)     // xbar_cents
    assert(got(1).getLong(3) == 280L)     // mean_adj arm1
    assert(got(1).getLong(4) == 32L)      // var_adj arm1
    assert(got(0).getLong(7) == 20L)      // effect
    assert(got(0).getLong(8) == 4000L)    // z_milli
    assert(got(0).getLong(9) == 952128L)  // var_reduction_ppm
  }

  test("morton interleave puts x bits at odd, y bits at even positions") {
    // x=3 (0b011), y=5 (0b101): z = (2¹+2³) + (2⁰+2⁴) = 10 + 17 = 27
    val df = Seq((3L, 5L), (0L, 0L), (255L, 255L)).toDF("xq", "yq")
      .selectExpr(Layout.mortonExpr("div") + " as z")
    assert(df.as[Long].collect().toSeq == Seq(27L, 0L, 65535L))
  }

  test("q198 on sf0.001: Z-order bounds BOTH dims; insertion order leaves user unprunable") {
    val rows = Layout.q198ZorderLayout(spark, "/root/testdata/sf0.001")
      .select("layout", "x_min", "x_max", "y_min", "y_max", "avg_span_ppm")
      .collect()
    val byLayout = rows.groupBy(_.getString(0))
    assert(byLayout.keySet == Set("zorder", "rowid"))
    def avgXSpan(l: String): Double = {
      val fs = byLayout(l)
      fs.map(r => r.getLong(2) - r.getLong(1) + 1).sum.toDouble / fs.length
    }
    // events arrive in time order, so insertion-order files are already
    // thin TIME strips — its boxes aren't terrible by area. The Z-order
    // claim is per-DIMENSION: insertion order spans ~the whole user
    // range in every file (a user point-lookup prunes nothing), Z-order
    // bounds the user span at ~1/4 of the range per file too. Demand a
    // 2× user-span win AND no area regression.
    assert(avgXSpan("zorder") * 2 <= avgXSpan("rowid"),
      s"zorder user-span ${avgXSpan("zorder")} not tighter than rowid ${avgXSpan("rowid")}")
    val area = rows.map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(area("zorder") <= area("rowid"),
      s"zorder area ${area("zorder")} worse than rowid ${area("rowid")}")
  }

  test("q220 on sf0.001: zone-map audit — Z-order prunes user lookups, rowid does not") {
    val rows = Layout.q220PruningAudit(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.keySet == Set(("zorder", "user_point"), ("zorder", "day_scan"),
      ("rowid", "user_point"), ("rowid", "day_scan")))
    // internal identity: skip_ppm must be derivable from avg_files_milli
    for (((_, _), (np, nf, avg, skip)) <- rows) {
      val hits = avg * np / 1000
      assert(skip == (np * nf - hits) * 1000000L / (np * nf),
        s"skip/avg inconsistent: $rows")
    }
    // the headline claim: insertion order leaves user point-lookups
    // unprunable (every probe touches ~all files); Z-order at least
    // halves the files touched
    val zU = rows(("zorder", "user_point"))._3
    val rU = rows(("rowid", "user_point"))._3
    assert(zU * 2 <= rU, s"zorder user probes $zU not < half of rowid $rU")
    // events arrive in time order, so rowid files are thin time strips:
    // day scans must prune well there (touch < half the files)
    val (_, nfR, rD, _) = rows(("rowid", "day_scan"))
    assert(rD < nfR * 1000 / 2, s"rowid day scans don't prune: $rows")
  }

  test("q205: hand-computed split conformal (rank quantile, coverage)") {
    // type "a": train cents [100,200] -> yhat=150
    // calib [150,160,130,120] -> residuals [0,10,20,30], n=4,
    //   k = least((9·5+9) div 10, 4) = least(5,4)=4 -> qhat = 30
    // test [150,175,185,110] -> residuals [0,25,35,40] -> covered 2/4
    val rows = Seq(
      ("a", 100L, 0L), ("a", 200L, 1L),
      ("a", 150L, 2L), ("a", 160L, 2L), ("a", 130L, 2L), ("a", 120L, 2L),
      ("a", 150L, 3L), ("a", 175L, 3L), ("a", 185L, 3L), ("a", 110L, 3L))
      .toDF("event_type", "cents", "split")
    val got = Uncertainty.conformalOn(rows).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 2L && r.getLong(2) == 4L && r.getLong(3) == 4L)
    assert(r.getLong(4) == 150L) // yhat
    assert(r.getLong(5) == 30L)  // qhat
    assert(r.getLong(6) == 2L && r.getLong(7) == 500000L)
  }

  test("q205: qhat rank clamps to n_calib when the +1 rank overshoots") {
    // n_calib=1: k = least((9·2+9) div 10, 1) = least(2,1) = 1
    val rows = Seq(
      ("a", 100L, 0L), ("a", 100L, 2L), ("a", 100L, 3L))
      .toDF("event_type", "cents", "split")
    val r = Uncertainty.conformalOn(rows).collect().head
    assert(r.getLong(5) == 0L)       // residual of the single calib row
    assert(r.getLong(7) == 1000000L) // test row exactly on the prediction
  }

  test("q199/q200/q205 run on real sf0.001 testdata") {
    val dir = "/root/testdata/sf0.001"
    val blb = Uncertainty.q199BlbBootstrap(spark, dir).collect()
    assert(blb.length == Uncertainty.BlbSubsets)
    val cuped = Uncertainty.q200CupedAbTest(spark, dir).collect()
    assert(cuped.length == 2)
    val conf = Uncertainty.q205ConformalInterval(spark, dir).collect()
    assert(conf.nonEmpty)
    // realized coverage of a 90% split-conformal interval: finite-sample
    // guarantee is >= 90% in expectation; allow sampling noise downward
    conf.foreach(r => assert(r.getLong(7) >= 700000L,
      s"${r.getString(0)}: coverage ${r.getLong(7)} ppm implausibly low"))
  }
}
