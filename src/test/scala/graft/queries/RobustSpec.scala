package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RobustSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q269 DBSCAN: constructed chain labels core/border/noise exactly") {
    // Line A(0) B(400) C(800) D(1200) E(1600) plus F(400,400), eps=500
    // Chebyshev, minPts=3: neighbors A{B,F} B{A,C,F} C{B,D,F} D{C,E}
    // E{D} F{A,B,C} → core {B,C,F}, border {A,D} (non-core touching a
    // core), noise {E} (only neighbor D is border, not core).
    val cell = Structure.GridCellMdeg
    val pts = Seq(
      (1L, 0L, 0L), (2L, 400L, 0L), (3L, 800L, 0L),
      (4L, 1200L, 0L), (5L, 1600L, 0L), (6L, 400L, 400L))
      .toDF("user_id", "lat", "lon")
      .withColumn("cx", expr(s"lat div $cell"))
      .withColumn("cy", expr(s"lon div $cell"))
    val got = Robust.dbscanCountsOn(pts).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      == ((6L, 3L, 2L, 1L)), s"got $got")
  }

  test("q269 DBSCAN: labels partition the point set") {
    val got = Robust.q269DbscanLabels(spark, dir).collect().head
    val (n, core, border, noise) =
      (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
    assert(n > 0 && core >= 0 && border >= 0 && noise >= 0)
    assert(core + border + noise == n, s"partition: $got")
  }

  test("q270 EB shrinkage: every source moves toward the corpus rate") {
    val rows = Robust.q270EbShrinkage(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nn = rows.map(_._2).sum
    val kk = rows.map(_._3).sum
    val globPpm = kk * 1000000L / nn
    rows.foreach { case (src, _, _, raw, shrunk) =>
      // shrunk sits between the raw rate and the corpus rate (integer
      // truncation allows ±1 ppm slack at the boundaries)
      val lo = math.min(raw, globPpm) - 1
      val hi = math.max(raw, globPpm) + 1
      assert(shrunk >= lo && shrunk <= hi,
        s"$src: raw=$raw glob=$globPpm shrunk=$shrunk")
      // and strictly closer to the corpus rate than raw was
      assert(math.abs(shrunk - globPpm) <= math.abs(raw - globPpm) + 1,
        s"$src did not shrink: raw=$raw glob=$globPpm shrunk=$shrunk")
    }
  }

  test("q271 salted join: equals the unsalted join and actually shuffles") {
    val got = Robust.q271SaltedJoin(spark, dir)
    // the demonstration is only honest if the salted join is a real
    // shuffled hash join, not a broadcast that never had a skew problem
    assert(got.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"),
      "salted join must be a ShuffledHashJoin")
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"event_type", expr("cast(round(value * 100) as bigint)").as("cents"))
    val dim = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum($"cents".cast("decimal(38,0)")).as("sc"))
      .select($"event_type", expr("sc div n").as("mean_c"))
    val expected = ev.join(broadcast(dim), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"cents" > $"mean_c", 1L).otherwise(0L)).as("n_above"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val gotMap = got.as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gotMap == expected, s"salted != unsalted: $gotMap vs $expected")
  }

  test("q272 SPRT: trajectory is cumulative and decisions match the bound") {
    val rows = Robust.q272Sprt(spark, dir)
      .orderBy("d").as[(String, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    var prevN = 0L
    rows.foreach { case (_, n, k, llr, dec) =>
      assert(n > prevN, "n_cum strictly increases (every day has events)")
      prevN = n
      assert(k >= 0 && k <= n)
      assert(llr == k * Robust.SprtLaMicro + (n - k) * Robust.SprtLbMicro)
      val want =
        if (llr >= Robust.SprtBoundMicro) "accept_h1"
        else if (llr <= -Robust.SprtBoundMicro) "accept_h0"
        else "continue"
      assert(dec == want, s"decision $dec at llr=$llr")
    }
  }

  test("q273 readability: internal formula consistency and sane bounds") {
    val rows = Robust.q273Readability(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, w, sn, y, f) =>
      assert(nDocs > 0 && w > 0 && sn >= nDocs && y >= nDocs, s"$src counts")
      assert(f == 206835L - 1015L * w / sn - 84600L * y / w,
        s"$src flesch formula: $f")
      assert(f <= 206835L)
    }
  }
}
