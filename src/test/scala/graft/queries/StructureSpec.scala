package graft.queries

import graft.SparkTestBase

class StructureSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("assortativity: a star graph is exactly -1") {
    // K1,3: center degree 3, leaves degree 1 — the canonical perfectly
    // disassortative graph. M=6 stubs, Σx=12, Σx²=30, Σxy=18:
    // r = (6·18 − 144)/(6·30 − 144) = −1.
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val got = Structure.assortativityOn(edges).collect().head
    assert(got.getLong(0) == 6L)
    assert(got.getLong(1) == -1000000L, s"star assortativity: $got")
  }

  test("assortativity: two disjoint regular cliques are degree-uniform (null)") {
    // all degrees equal → zero variance → the ppm division is 0/0;
    // Spark's non-ANSI div yields null — the documented read-out for a
    // regular graph (assortativity is undefined there)
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    assert(Structure.assortativityOn(edges).collect().head.isNullAt(1))
  }

  test("q252 HITS: one authority per event type, max normalized to 1e6") {
    val rows = Structure.q252Hits(spark, dir)
      .as[(String, Long)].collect().toMap
    val nTypes = graft.sources.Tables.events(spark, dir)
      .select("event_type").distinct().count()
    assert(rows.size == nTypes)
    assert(rows.values.max == 1000000L)
    assert(rows.values.forall(v => v > 0 && v <= 1000000L))
  }

  test("q253 triples: ordered, supported, and consistent with the basket universe") {
    val rows = Structure.q253FrequentTriples(spark, dir)
      .as[(String, String, String, Long, Long)].collect()
    assert(rows.nonEmpty, "sf0.001 has co-occurring event-type triples")
    assert(rows.forall { case (a, b, c, s, ppm) =>
      a < b && b < c && s > 0 && ppm > 0 && ppm <= 1000000L })
    // spot-check one triple's support directly
    val (ta, tb, tc, support, _) = rows.head
    val direct = graft.sources.Tables.events(spark, dir)
      .select($"user_id", org.apache.spark.sql.functions.to_date($"ts").as("d"),
        $"event_type")
      .distinct()
      .groupBy("user_id", "d")
      .agg(org.apache.spark.sql.functions.collect_set("event_type").as("ts"))
      .where(org.apache.spark.sql.functions.array_contains($"ts", ta) &&
        org.apache.spark.sql.functions.array_contains($"ts", tb) &&
        org.apache.spark.sql.functions.array_contains($"ts", tc))
      .count()
    assert(direct == support, s"($ta,$tb,$tc): direct=$direct support=$support")
  }

  test("q255 burstiness: Fano is non-negative and exceeds 1e6 only when clumped") {
    val rows = Structure.q255TermBurstiness(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == Structure.BurstTopTerms)
    rows.foreach { case (term, total, df, fano) =>
      assert(total >= df, s"$term: total $total < df $df")
      assert(fano >= 0, s"$term: negative Fano $fano")
      // a term occurring at most once per doc has F = 1 − df/n < 1e6
      if (total == df) assert(fano < 1000000L, s"$term: $fano")
    }
  }

  test("q256 Gini: in [0, 1e6) per source; equal lengths give ~0") {
    val rows = Structure.q256GiniLength(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, g) =>
      assert(n > 0 && g >= 0 && g < 1000000L, s"$src: n=$n gini=$g")
    }
  }

  test("q257 McNemar: chi2 recomputes from the discordant cells") {
    val r = Structure.q257Mcnemar(spark, dir).collect().head
    val (n, b, c, chi2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0 && b >= 0 && c >= 0 && b + c <= n)
    assert(b + c > 0, "fixture must have discordant pairs")
    assert(chi2 == (b - c) * (b - c) * 1000000L / (b + c))
  }

  test("q258 Spearman: strongly positive between chars and tokens, in [-1, 1]") {
    val r = Structure.q258Spearman(spark, dir).collect().head
    assert(r.getLong(0) > 0)
    val rho = r.getDouble(1)
    assert(rho >= -1.0 && rho <= 1.0)
    // length in chars and token count are near-monotone twins
    assert(rho > 0.5, s"rho=$rho")
  }

  test("q260 Cramer's V: in [0, 1] with the q92 dof") {
    val r = Structure.q260CramersV(spark, dir).collect().head
    assert(r.getLong(0) > 0)
    assert(r.getLong(1) >= 1)
    val v = r.getDouble(2)
    assert(v >= 0.0 && v <= 1.0, s"v=$v")
  }

  test("q262 Nelson-Aalen: hand-computed hazard increments") {
    // durations (t, ev): t=1 {e,e,c}, t=2 {e,c}. Risk sets 5 then 2:
    // inc = 2e6 div 5 = 400000, then 1e6 div 2 = 500000 -> cum 900000.
    val t = Seq((1L, 1L), (1L, 1L), (1L, 0L), (2L, 1L), (2L, 0L))
      .toDF("t", "ev")
    val got = Reliability.nelsonAalenOn(t).orderBy("t_day")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got(0) == ((1L, 5L, 2L, 1L, 400000L)), got.mkString(","))
    assert(got(1) == ((2L, 2L, 1L, 1L, 900000L)), got.mkString(","))
  }

  test("q263 Heaps fit: 10 checkpoints; saturated synthetic vocab reads β≈0") {
    val r = Structure.q263HeapsFit(spark, dir).collect().head
    assert(r.getLong(0) == 10L, s"points: $r")
    // the fixed 31-token synthetic vocabulary saturates inside the first
    // decile — exactly the "template corpus" reading the query documents
    val beta = r.getLong(1)
    assert(beta >= 0 && beta < 1000000L, s"beta_micro=$beta")
    // and a linearly-growing vocabulary (one fresh token per doc) reads
    // an exponent near 1
    val grow = (1L to 200L).map(i => (i, s"common alpha beta unique$i"))
      .toDF("doc_id", "text")
    val b2 = Structure.q263HeapsFitOn(grow).collect().head.getLong(1)
    assert(b2 > 700000L, s"growing vocab must fit a near-1 exponent: $b2")
  }

  test("q264 odds ratio: cells partition the pair and the CI brackets OR") {
    val r = Structure.q264OddsRatio(spark, dir).collect().head
    val (a, b, c, d) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(a >= 0 && b >= 0 && c >= 0 && d >= 0 && a + b + c + d > 0)
    val or = r.getLong(6) / 1e6
    assert(r.getDouble(7) <= or + 1e-4 && or <= r.getDouble(8) + 1e-4,
      s"CI must bracket the point estimate: $r")
  }

  test("q265 entropy rate: bounded by ln(n_states)") {
    val r = Structure.q265EntropyRate(spark, dir).collect().head
    val h = r.getLong(3)
    assert(h >= 0, s"negative entropy: $r")
    assert(h <= math.round(math.log(r.getLong(0).toDouble) * 1e6),
      s"entropy above the uniform bound: $r")
  }

  test("q266 grid pairs: cross-cell neighbors found, far points excluded") {
    import org.apache.spark.sql.functions._
    // (1) same cell within 500 -> pair; (2) adjacent cells, dist 2 ->
    // pair (the probe must cross the cell boundary); (3) dist 600 -> no
    val pts = Seq(
      (1L, 0L, 0L), (2L, 400L, 400L),      // pair (dist 400)
      (3L, 999L, 999L), (4L, 1001L, 1001L),// pair across cells (dist 2)
      (5L, 5000L, 5000L), (6L, 5600L, 5000L)) // dist 600 -> no pair
      .toDF("user_id", "lat", "lon")
      .withColumn("cx", expr(s"lat div ${Structure.GridCellMdeg}"))
      .withColumn("cy", expr(s"lon div ${Structure.GridCellMdeg}"))
    val got = Structure.gridPairsOn(pts)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 4L)), got.toString)
  }

  test("q267 ordered funnel: order and window both bind") {
    import org.apache.spark.sql.functions._
    val d = 86400L * 1000000L
    val ev = Seq(
      // full chain: view@0, click@3d, purchase@8d (5d after click)
      (1L, "view", 0L), (1L, "click", 3 * d), (1L, "purchase", 8 * d),
      // click outside the 7d window of the view
      (2L, "view", 0L), (2L, "click", 8 * d),
      // purchase BEFORE the first view must not count
      (3L, "purchase", 0L), (3L, "view", 1 * d),
      // no view at all
      (4L, "click", 0L))
      .toDF("user_id", "event_type", "us")
    val r = Structure.orderedFunnelOn(ev).collect().head
    assert(r.getLong(0) == 4L, s"n_users: $r")
    assert(r.getLong(1) == 3L, s"n_view: $r")
    assert(r.getLong(2) == 1L, s"n_click: $r")
    assert(r.getLong(3) == 1L, s"n_purchase: $r")
  }

  test("q268 interval coverage: overlaps merge, gaps split islands") {
    // user 1: [0,10] [5,20] [30,40] -> 2 islands, coverage 30
    // user 2: [0,1] -> 1 island, coverage 1
    val iv = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 15L), (1L, 3L, 30L, 10L),
      (2L, 4L, 0L, 1L))
      .toDF("user_id", "event_id", "st", "dur")
    val r = Structure.intervalCoverageOn(iv).collect().head
    assert(r.getLong(0) == 2L, s"n_users: $r")
    assert(r.getLong(1) == 4L, s"n_intervals: $r")
    assert(r.getLong(2) == 3L, s"n_islands: $r")
    assert(r.getLong(3) == 31L, s"coverage: $r")
  }
}
