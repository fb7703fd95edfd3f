package graft.queries

import java.sql.Date

import graft.SparkTestBase

/** SeriesStats family (q203 ACF, q204 equi-depth histogram):
  * hand-computed planted series (alternating → r(1) = −1, r(2) = +1;
  * linear → r = +1 at every lag), gap alignment by day index, the
  * constant-series null guard, uniform equi-depth buckets, and the
  * tie-group-never-straddles property. */
class SeriesStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def day(i: Int): Date = Date.valueOf(s"2024-01-${"%02d".format(i + 1)}")

  /** One row per event: day i appears cnt(i) times. */
  private def series(counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) => Seq.fill(c)(day(i)) }
      .toDF("d")

  test("q203: alternating series has r(1) = -1000, r(2) = +1000 (hand-computed)") {
    val got = SeriesStats.acfOn(series(Seq(1, 2, 1, 2, 1, 2)), 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val l1 = got(1L)
    // n=5 sx=7 sy=8 sxy=10 sxx=11 syy=14 -> cov=-6 vx=6 vy=6
    assert(l1.getLong(1) == 5L)
    assert(l1.getLong(2) == -6L && l1.getLong(3) == 6L && l1.getLong(4) == 6L)
    assert(l1.getLong(5) == -1000L)
    val l2 = got(2L)
    assert(l2.getLong(1) == 4L)
    assert(l2.getLong(5) == 1000L)
  }

  test("q203: linear series is perfectly autocorrelated at every lag") {
    val got = SeriesStats.acfOn(series(Seq(1, 2, 3, 4, 5, 6, 7, 8)), 3).collect()
    assert(got.length == 3)
    got.foreach(r => assert(r.getLong(5) == 1000L,
      s"lag ${r.getLong(0)}: r_milli ${r.getLong(5)}"))
  }

  test("q203: constant series yields null r (zero variance), not a crash") {
    val got = SeriesStats.acfOn(series(Seq(3, 3, 3, 3)), 2).collect()
    got.foreach(r => assert(r.isNullAt(5)))
  }

  test("q203: a missing day drops its pairs instead of shifting later lags") {
    // days 0,1,3 -> lag-1 pairs align by INDEX: only (0,1); (3) has no day 2
    val df = Seq(day(0), day(1), day(3)).toDF("d")
    val got = SeriesStats.acfOn(df, 1).collect()
    assert(got.length == 1 && got.head.getLong(1) == 1L)
  }

  test("q204: 32 distinct values over 16 buckets -> 2 values per bucket") {
    val vals = (1L to 32L).toDF("v")
    val got = SeriesStats.equidepthOn(vals, 16)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 16)
    (0 until 16).foreach { k =>
      val r = got(k.toLong)
      assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
      assert(r.getLong(3) == 2L * k + 1 && r.getLong(4) == 2L * k + 2)
      assert(r.getLong(5) == 2L * k + 1) // (lo+hi) div 2 floors
    }
  }

  test("q212: rank quartiles are exact order statistics, ties respected") {
    // a: [10,20,30,40] -> ranks ceil(.25*4)=1, 2, 3 -> 10/20/30
    // b: [5,5,5,9] -> all three quartiles are 5
    val rows = (Seq(10L, 20L, 30L, 40L).map(("a", _)) ++
      Seq(5L, 5L, 5L, 9L).map(("b", _))).toDF("event_type", "v")
    val got = SeriesStats.groupQuartilesOn(rows).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == (4L, 10L, 20L, 30L))
    assert(got("b") == (4L, 5L, 5L, 5L))
  }

  test("q204: a tie group never straddles a bucket boundary") {
    // value 5 has 10 of 16 rows: exact row-ntile at B=4 would split it
    val vals = (Seq.fill(10)(5L) ++ (6L to 11L)).toDF("v")
    val got = SeriesStats.equidepthOn(vals, 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    // hand-computed: prior(5)=0 -> b0; 6,7 -> b2; 8..11 -> b3; b1 empty
    assert(got.keySet == Set(0L, 2L, 3L))
    assert(got(0L).getLong(2) == 10L && got(0L).getLong(3) == 5L
      && got(0L).getLong(4) == 5L)
    assert(got(2L).getLong(2) == 2L && got(2L).getLong(3) == 6L
      && got(2L).getLong(4) == 7L)
    assert(got(3L).getLong(2) == 4L && got(3L).getLong(3) == 8L
      && got(3L).getLong(4) == 11L)
  }

  /** One row per (type, day-event): day i of `et` appears cnt(i) times. */
  private def typedSeries(ss: (String, Seq[Int])*) =
    ss.flatMap { case (et, counts) =>
      counts.zipWithIndex.flatMap { case (c, i) => Seq.fill(c)((et, day(i))) }
    }.toDF("event_type", "d")

  test("q225: the slope outlier day cannot move the Theil-Sen median") {
    // counts 1,3,5,100: five of six pairwise slopes see the spike, but
    // the lower median is still the clean +2/day (OLS says +30.6/day)
    val got = SeriesStats.theilSenOn(typedSeries("a" -> Seq(1, 3, 5, 100)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(got == List(("a", 4L, 6L, 2000000L)), s"$got")
  }

  test("q225: per-type medians are independent; negative slopes truncate alike") {
    val got = SeriesStats.theilSenOn(typedSeries(
      "up" -> Seq(1, 2, 3), "down" -> Seq(7, 4, 1)))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("up") == 1000000L && got("down") == -3000000L, s"$got")
  }

  test("q226: a planted 1-day lead spikes r(+1) to exactly +1000") {
    // y(d) = x(d-1): x=[1,2,3,1] (series a), y=[9,1,2,3] (series b)
    val rows = (Seq(1, 2, 3, 1).zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((true, day(i))) } ++
      Seq(9, 1, 2, 3).zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)((false, day(i))) }).toDF("a", "d")
    val got = SeriesStats.xcorrOn(rows, 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(-1L, 0L, 1L))
    val l1 = got(1L)
    assert(l1.getLong(1) == 3L && l1.getLong(2) == 6L && l1.getLong(5) == 1000L)
    assert(got(0L).getLong(5) == -605L) // hand-computed off-lag r
    assert(got(-1L).getLong(5) == -115L)
  }

  test("q235: hand-computed skew/kurtosis from integer power sums") {
    import spark.implicits._
    // a = {0,0,0,1}: M2n=3, M3n=6, M4n=21
    //   skew = 6/3^1.5 = 1.1547 -> 1155; kurt = 21/9 - 3 -> -667
    // b = {-1,0,0,1}: symmetric -> skew 0; kurt = .5/.25 - 3 -> -1000
    val rows = (Seq(0L, 0L, 0L, 1L).map(("a", _)) ++
      Seq(-1L, 0L, 0L, 1L).map(("b", _))).toDF("g", "c")
    val got = SeriesStats.momentsOn(rows).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("a") == (4L, 1155L, -667L), s"$got")
    assert(got("b") == (4L, 0L, -1000L), s"$got")
  }

  test("q235: a constant group yields nulls, not a division crash") {
    import spark.implicits._
    val rows = Seq(("k", 7L), ("k", 7L), ("k", 7L)).toDF("g", "c")
    val r = SeriesStats.momentsOn(rows).collect().head
    assert(r.getLong(1) == 3L && r.isNullAt(2) && r.isNullAt(3))
  }

  test("q238: trimming drops outliers entirely (winsorize would clip)") {
    import spark.implicits._
    // a: 1..10, 10% trim -> keep 2..9, mean 5.5
    // b: {0, 2 x8, 1000} -> keep the eight 2s, mean exactly 2
    val rows = ((1L to 10L).map(("a", _)) ++
      (Seq(0L) ++ Seq.fill(8)(2L) ++ Seq(1000L)).map(("b", _)))
      .toDF("event_type", "v")
    val got = SeriesStats.trimmedMeanOn(rows, 10).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("a") == (10L, 8L, 5500L), s"$got")
    assert(got("b") == (10L, 8L, 2000L), s"$got")
  }

  test("q248: token weight drags the median toward the huge doc") {
    import spark.implicits._
    // five 10-token docs of len 10 and one 900-token doc of len 900:
    // row median = 10 (3rd of 6); token median = 900 (900 of 950 tokens)
    val rows = (Seq.fill(5)(("s", 10L, 10L)) :+ (("s", 900L, 900L)))
      .toDF("source", "v", "w")
    val got = SeriesStats.weightedMedianOn(rows).collect().head
    assert(got.getLong(1) == 6L && got.getLong(2) == 950L)
    assert(got.getLong(3) == 10L, s"row median: $got")
    assert(got.getLong(4) == 900L, s"token median: $got")
  }

  test("q241: candles bound their members and conserve volume") {
    val dir = "/root/testdata/sf0.001"
    val got = SeriesStats.q241Ohlc(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (vol, o, h, l, c) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))
      assert(vol > 0 && l <= h)
      assert(o >= l && o <= h && c >= l && c <= h, s"open/close outside range: $r")
    }
    val total = graft.sources.Tables.events(spark, dir).count()
    assert(got.map(_.getLong(2)).sum == total)
  }

  test("q242: ties share one rank; extremes hit 0 and 1e6 exactly") {
    val got = SeriesStats
      .q242PercentileRank(spark, "/root/testdata/sf0.001").collect()
    assert(got.nonEmpty)
    // equal values -> identical pct/cume (tie-stable, unlike rank())
    got.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).distinct.length == 1)
      assert(rs.map(_.getLong(4)).distinct.length == 1)
    }
    assert(got.minBy(_.getLong(1)).getLong(2) == 0L) // min: nothing below
    assert(got.maxBy(_.getLong(1)).getLong(4) == 1000000L) // max: cume=1
    // pct < cume everywhere (c >= 1)
    assert(got.forall(r => r.getLong(3) < r.getLong(4)))
  }

  test("q238: a boundary tie group contributes partially by exact rank overlap") {
    import spark.implicits._
    // {1,1,1,1} at 25% trim: lo=1, keep ranks 2..3 -> kept=2 from the
    // single tie group; mean 1.0
    val rows = Seq.fill(4)(("t", 1L)).toDF("event_type", "v")
    val got = SeriesStats.trimmedMeanOn(rows, 25).collect().head
    assert(got.getLong(1) == 4L && got.getLong(2) == 2L
      && got.getLong(3) == 1000L)
  }
}
