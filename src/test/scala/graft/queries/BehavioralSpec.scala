package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Behavioral invariants for q142 co-occurrence/PMI, q210 RFM
  * segmentation, and q211 transition dwell beyond the DuckDB oracle
  * equivalence the driver checks. */
class BehavioralSpec extends SparkTestBase {

  test("q142: planted association is positive, planted avoidance negative, counts exact") {
    import spark.implicits._
    // 40 users: 1-20 always pair x+y (associated); z appears for 21-40
    // only (never with x/y); w appears for everyone (independent-ish)
    val rows =
      (1 to 20).flatMap(u => Seq((u.toLong, "x"), (u.toLong, "y"), (u.toLong, "w"))) ++
      (21 to 40).flatMap(u => Seq((u.toLong, "z"), (u.toLong, "w")))
    val out = Behavioral.q142CooccurrencePmiOn(rows.toDF("user_id", "event_type"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // never-co-occurring pairs emit no row at all
    assert(!out.contains(("x", "z")) && !out.contains(("y", "z")))
    // x+y: c_pair = c_a = c_b = 20, N = 40 -> PMI = ln(40*20/400) = ln 2
    val (ca, cb, cp, pmi) = out(("x", "y"))
    assert((ca, cb, cp) == (20L, 20L, 20L))
    assert(pmi == math.round(math.log(2.0) * 1e6))
    // w co-occurs with everything it can: PMI(w, x) = ln(40*20/(40*20)) = 0
    assert(out(("w", "x"))._4 == 0L)
    // z only within its half: PMI(w, z) = ln(40*20/(40*20)) = 0
    assert(out(("w", "z"))._4 == 0L)
  }

  test("q142: duplicate events do not inflate counts (distinct user-type)") {
    import spark.implicits._
    val rows = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
    val out = Behavioral.q142CooccurrencePmiOn(rows.toDF("user_id", "event_type"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    assert(out.toSeq == Seq(("x", "y", 2L)))
  }

  test("q210: hand-computed quintiles — 10 users, 2 per diagonal cell") {
    import spark.implicits._
    // user u: recency=u, frequency=u, monetary=100u -> all three quintiles
    // equal (u-1)*5 div 10, so exactly 5 diagonal cells of 2 users each
    val pu = (1L to 10L).map(u => (u, u, u, u * 100L))
      .toDF("user_id", "recency_days", "frequency", "monetary_cents")
    val got = Behavioral.rfmOn(pu).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.size == 5)
    (0L to 4L).foreach { k =>
      val (n, mf, mm) = got((k, k, k))
      assert(n == 2L)
      assert(mf == 2 * k + 1) // (2k+1 + 2k+2) div 2
      assert(mm == 200 * k + 150)
    }
  }

  test("q210: a metric tie cohort lands in ONE quintile") {
    import spark.implicits._
    // all users share frequency=7 -> f_q = 0 for everyone (prior 0)
    val pu = (1L to 10L).map(u => (u, u, 7L, u * 100L))
      .toDF("user_id", "recency_days", "frequency", "monetary_cents")
    val fq = Behavioral.rfmOn(pu).collect().map(_.getLong(1)).distinct
    assert(fq.toSeq == Seq(0L), s"tie cohort split across quintiles: $fq")
  }

  test("q213: cohort LTV accumulates per age; horizon cuts late spend") {
    import spark.implicits._
    import java.sql.Date
    def d(i: Int) = Date.valueOf(s"2024-01-${"%02d".format(i + 1)}")
    // cohort day0: users 1,2 — age0 total 300, age1 total 50, day9 cut;
    // cohort day1: user 3 — age0 total 300
    val e = Seq(
      (1L, d(0), 100L), (1L, d(1), 50L), (1L, d(9), 999L),
      (2L, d(0), 200L), (3L, d(1), 300L))
      .toDF("user_id", "d", "cents")
    val got = Behavioral.q213CohortLtvOn(e).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(("2024-01-01", 0L)) == (2L, 150L))
    assert(got(("2024-01-01", 1L)) == (2L, 175L))
    assert(got(("2024-01-02", 0L)) == (1L, 300L))
    assert(got.size == 3, s"horizon leak: $got")
  }

  test("q214: predictor argmax with tie-break; unseen state drops from eval") {
    import spark.implicits._
    // train: a->b x3, a->c x1, b->a x2 => predict a->b, b->a
    // test: (a,b) hit, (a,c) miss, (b,a) hit, (c,a) dropped (c unseen)
    val bigrams = (
      Seq.fill(3)((0L, "a", "b")) ++ Seq((0L, "a", "c")) ++
        Seq.fill(2)((0L, "b", "a")) ++
        Seq((3L, "a", "b"), (3L, "a", "c"), (3L, "b", "a"), (3L, "c", "a")))
      .toDF("split", "prev", "curr")
    val got = Behavioral.markovAccuracyOn(bigrams).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == ("b", 2L, 1L, 500000L))
    assert(got("b") == ("a", 1L, 1L, 1000000L))
    assert(!got.contains("c"))
  }

  test("q211: hand-computed dwell aggregation across users") {
    import spark.implicits._
    // user 1: a@0 b@10 a@40 ; user 2: a@100 b@120
    // a->b: 10s and 20s -> n=2 mean=15 min=10 max=20 ; b->a: 30s
    val rows = Seq(
      (1L, 1L, "a", 0L), (1L, 2L, "b", 10000000L), (1L, 3L, "a", 40000000L),
      (2L, 4L, "a", 100000000L), (2L, 5L, "b", 120000000L))
      .toDF("user_id", "event_id", "event_type", "us")
      .select(col("user_id"), col("event_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val got = Behavioral.q211TransitionDwellOn(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(("a", "b")) == (2L, 15L, 10L, 20L))
    assert(got(("b", "a")) == (1L, 30L, 30L, 30L))
    assert(got.size == 2)
  }

  test("q227: long holds dominate the time-weighted average exactly") {
    import spark.implicits._
    // u1: 100c held 10s, 200c held 30s -> twa = (100*10+200*30)/40
    //   = 175 c -> 175000 millicents; the last event holds nothing.
    // u2: single event -> no holds -> excluded.
    val rows = Seq(
      (1L, 1L, 100L, 0L), (1L, 2L, 200L, 10000000L),
      (1L, 3L, 50L, 40000000L), (2L, 4L, 999L, 0L))
      .toDF("user_id", "event_id", "c", "us")
      .select(col("user_id"), col("event_id"), col("c"),
        timestamp_micros(col("us")).as("ts"))
    val got = Behavioral.twaOn(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(1L -> ((2L, 40000000L, 175000L))), s"$got")
  }

  test("q244: planted journeys count exact non-overlapping motifs") {
    import spark.implicits._
    // u1 journey: v v c p p e s v p  ->
    //   browse_buy 'v+cp': 1 (vvcp); buy_error 'pe': 1 (pe at 4-5);
    //   signup_convert 's[^p]*p': 1 (svp)
    // u2 journey: s c p s v c p -> signup_convert counts 2 (scp, svcp...
    //   non-overlapping leftmost: scp then svcp -> 2); browse_buy: 1 (vcp)
    val types = Map('v' -> "view", 'c' -> "click", 'p' -> "purchase",
      'e' -> "error", 's' -> "signup")
    def ev(u: Long, journey: String) = journey.zipWithIndex.map {
      case (ch, i) => (u, (i + 1).toLong, types(ch), i.toLong * 1000000L)
    }
    val rows = (ev(1L, "vvcppesvp") ++ ev(2L, "scpsvcp"))
      .toDF("user_id", "event_id", "event_type", "us")
      .select(col("user_id"), col("event_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val got = Behavioral.matchRecognizeOn(rows).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == (9L, 1L, 1L, 1L), s"${got(1L)}")
    assert(got(2L) == (7L, 1L, 0L, 2L), s"${got(2L)}")
  }

  test("q251: Wilson bounds on the corpus stay in [0,1] and bracket p-hat") {
    val got = Behavioral
      .q251WilsonAdoption(spark, "/root/testdata/sf0.001").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (p, lo, hi) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lo >= 0L && hi <= 1000000L, s"outside [0,1]: $r")
      assert(lo <= p && p <= hi, s"interval misses p-hat: $r")
      assert(hi > lo, s"degenerate interval: $r")
    }
  }

  test("q251: hand-computed Wilson interval for k=8, n=10") {
    // center=(0.8+0.19208)/1.38416, half=1.96*sqrt(.016+.009604)/1.38416
    // -> p=800000, lo=490157, hi=943319 (python-pinned, same op order)
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    // build via the same arithmetic path: 10 users, 8 with 'x'
    val e = ((1L to 8L).map(u => ("x", u)) ++ Seq(("y", 9L), ("y", 10L)))
      .toDF("event_type", "user_id")
    val n = e.agg(countDistinct(col("user_id")).as("n"))
    val out = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("k"))
      .crossJoin(broadcast(n))
      .withColumn("p", col("k").cast("double") / col("n"))
      .withColumn("z2n", lit(3.8416) / col("n"))
      .withColumn("center",
        (col("p") + col("z2n") / 2) / (lit(1.0) + col("z2n")))
      .withColumn("half",
        sqrt(col("p") * (lit(1.0) - col("p")) / col("n") +
          col("z2n") / (col("n") * 4)) * lit(1.96) / (lit(1.0) + col("z2n")))
      .select(col("event_type"),
        expr("cast(round(p * 1000000) as bigint)"),
        expr("cast(round((center - half) * 1000000) as bigint)"),
        expr("cast(round((center + half) * 1000000) as bigint)"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("x") == (800000L, 490157L, 943319L), s"$out")
  }

  test("q227: zero-span users are excluded, simultaneous ties hold zero") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, 100L, 0L), (1L, 2L, 900L, 0L), // same instant: span 0
      (2L, 3L, 10L, 0L), (2L, 4L, 30L, 0L), (2L, 5L, 99L, 2000000L))
      .toDF("user_id", "event_id", "c", "us")
      .select(col("user_id"), col("event_id"), col("c"),
        timestamp_micros(col("us")).as("ts"))
    val got = Behavioral.twaOn(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // u2: hold1 = 10c for 0us (tie), hold2 = 30c for 2s -> twa = 30c
    assert(got == Map(2L -> ((2L, 2000000L, 30000L))), s"$got")
  }
}
