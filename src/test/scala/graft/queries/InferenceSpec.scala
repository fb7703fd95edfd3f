package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Inference/diagnostics family (q162–q168): each query checked against
  * hand-computed answers on planted inputs — a perfect line for OLS, a
  * known median/outlier set for MAD, a step series for the changepoint,
  * a doubling series for the growth factor, a scripted session for
  * attribution, a hand-scored pair for Fellegi–Sunter, and
  * hand-classified statuses for the snapshot diff. (The sf-table runs
  * are oracle-checked by the driver; these specs pin the SEMANTICS on
  * inputs where the right answer is computable by eye.) */
class InferenceSpec extends SparkTestBase {
  import spark.implicits._

  /** Day 0 = 2020-01-01 00:00 UTC. (user, dayIdx, secOfDay, type, value)
    * → events rows with unique ascending event_ids. */
  private def events(rows: Seq[(Long, Int, Long, String, Double)]): DataFrame =
    rows.zipWithIndex.map { case ((u, day, off, t, v), i) =>
      (i.toLong,
        new java.sql.Timestamp(1577836800000L + day * 86400000L + off * 1000L),
        u, t, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  // --- q162 OLS trend ----------------------------------------------

  test("q162: a planted perfect line recovers slope/intercept exactly, r2=1") {
    // type "lin": y = 3 + 2x events on day x (x = 0..4): 3,5,7,9,11 events
    val rows = for {
      x <- 0 to 4
      k <- 0 until (3 + 2 * x)
    } yield (1L, x, k.toLong + 1, "lin", 0.0)
    val out = Inference.q162LinregTrendOn(events(rows))
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.toSeq === Seq(("lin", 5L, 2.0, 3.0, 1.0)))
  }

  test("q162: a constant series has slope 0 and NULL r2 (zero y-variance)") {
    val rows = for (x <- 0 to 3) yield (1L, x, 1L, "flat", 0.0)
    val out = Inference.q162LinregTrendOn(events(rows))
      .select("slope", "r2").collect()
    assert(out === Array(Row(0.0, null)))
  }

  // --- q163 MAD outliers -------------------------------------------

  test("q163: known median/MAD and exactly one planted extreme outlier") {
    // values 1..7 plus one 1000.0: n=8, median=(4+4.5... ) values sorted:
    // 1,2,3,4,5,6,7,1000 → median = 4.5 → med2_micro = 9e6.
    // deviations |v-4.5|: 3.5,2.5,1.5,.5,.5,1.5,2.5,995.5 → MAD = 2.0
    // (sorted devs: .5,.5,1.5,1.5,2.5,2.5,3.5,995.5 → median 2.0)
    // fence 3*1.4826*2.0 = 8.8956 → only 1000 (dev 995.5) flagged.
    val vs = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 1000.0)
    val rows = vs.zipWithIndex.map { case (v, i) =>
      (1L, 0, i.toLong + 1, "m", v)
    }
    val out = Inference.q163MadOutliersOn(events(rows))
      .as[(String, Long, Long, Long, Long)].collect()
    // med2 = 2*4.5e6 = 9e6; mad4 = 4*MAD_micro = 4*2e6 = 8e6
    assert(out.toSeq === Seq(("m", 8L, 9000000L, 8000000L, 1L)))
  }

  // --- q164 changepoint --------------------------------------------

  test("q164: a step series splits exactly at the step boundary") {
    // 4 days at 2/day then 4 days at 10/day → best split after day 3
    // (0-indexed day 3 = 2020-01-04, the last left-segment day).
    val rows = for {
      day <- 0 to 7
      k <- 0 until (if (day < 4) 2 else 10)
    } yield (1L, day, k.toLong + 1, "step", 0.0)
    val out = Inference.q164ChangepointOn(events(rows))
      .as[(String, Long, String, Long)].collect()
    assert(out.length === 1)
    val (t, nDays, split, gain) = out.head
    assert(t === "step" && nDays === 8L && split === "2020-01-04")
    // f(best) - f(nosplit): (8²/4 + 40²/4) - 48²/8 = 416 - 288 = 128
    assert(gain === 128L * 1000000L)
  }

  test("q164: argmax tie-break picks the earliest day") {
    // symmetric series 1,5,5,1: splits after day2 (k=2: S_l=6,n_l=2 →
    // 18 + 36/2=18 → 36) and ... compute both engines-identically; the
    // mirrored split scores equal → rank orders by (score desc, d asc)
    // so the EARLIER day must win.
    val rows = for {
      (c, day) <- Seq(1, 5, 5, 1).zipWithIndex
      k <- 0 until c
    } yield (1L, day, k.toLong + 1, "sym", 0.0)
    val out = Inference.q164ChangepointOn(events(rows))
      .select("split_day").as[String].collect()
    // candidate scores: k=1: 1+121/3≈41.3; k=2: 36/2+36/2=36; k=3:
    // 121/3+1≈41.3 → tie between day0 and day2 splits → earliest day0
    assert(out.toSeq === Seq("2020-01-01"))
  }

  // --- q165 growth rate --------------------------------------------

  test("q165: a doubling week reports growth_ppm = 2,000,000") {
    // days 0-6: 1/day; days 7-13: 2/day → at day 13: cur7=14, prev7=7
    val rows = for {
      day <- 0 to 13
      k <- 0 until (if (day < 7) 1 else 2)
    } yield (1L, day, k.toLong + 1, "g", 0.0)
    val out = Inference.q165GrowthRateOn(events(rows))
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.toSeq === Seq(("g", "2020-01-14", 14L, 7L, 2000000L)))
  }

  test("q165: days with zero events participate as zeros, not gaps") {
    // type "z" fires only on days 0 and 13; days 1-12 must count as 0 —
    // a day grid built only from z's own rows would leave idx < 14 and
    // emit nothing. A second type "bg" fires daily to define the grid.
    val rows =
      Seq((1L, 0, 1L, "z", 0.0), (1L, 13, 1L, "z", 0.0)) ++
        (0 to 13).map(d => (2L, d, 2L, "bg", 0.0))
    val out = Inference.q165GrowthRateOn(events(rows))
      .where(col("event_type") === "z")
      .as[(String, String, Long, Long, Long)].collect()
    // z: cur7 (days 7-13) = 1, prev7 (days 0-6) = 1 → 1,000,000 ppm
    assert(out.toSeq === Seq(("z", "2020-01-14", 1L, 1L, 1000000L)))
  }

  // --- q166 attribution --------------------------------------------

  test("q166: scripted sessions credit first- and last-touch by hand") {
    // u1 session: view(t0) → click(t0+60) → purchase(t0+120):
    //   first=view, last=click.
    // u2: click(t0) …45min gap… purchase(t0+2700): new session, so
    //   first=purchase (its own session starts with it) and NO last
    //   touch (click is 2700s > 1800s before it).
    // u3: purchase alone: first=purchase, no last touch.
    val rows = Seq(
      (1L, 0, 100L, "view", 0.0), (1L, 0, 160L, "click", 0.0),
      (1L, 0, 220L, "purchase", 0.0),
      (2L, 0, 1000L, "click", 0.0), (2L, 0, 3700L, "purchase", 0.0),
      (3L, 0, 500L, "purchase", 0.0))
    val out = Inference.q166AttributionOn(events(rows))
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(("view", 1L, 0L), ("click", 0L, 1L),
      ("purchase", 2L, 0L)))
  }

  test("q166: a prior purchase is never the last-touch credit") {
    // u1: purchase(t0) → purchase(t0+60): the second purchase's
    // preceding event is a purchase → skipped; no other event → no
    // last-touch. Both purchases are first-touch 'purchase'.
    val rows = Seq(
      (1L, 0, 100L, "purchase", 0.0), (1L, 0, 160L, "purchase", 0.0))
    val out = Inference.q166AttributionOn(events(rows))
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(("purchase", 2L, 0L)))
  }

  // --- q167 Fellegi–Sunter -----------------------------------------

  private def customers(rows: Seq[(Long, Int, String, Double)]): DataFrame =
    rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")

  test("q167: hand-scored pairs land in the expected decision bands") {
    // block nat=1: (1,2) agree seg + bal(Δ10≤50) + key(Δ1≤100)
    //   → 1504077+2772589+847298 = 5123964 → link
    // (1,200): agree seg, bal Δ10 ≤ 50, key Δ199 > 100
    //   → 1504077+2772589-847298 = 3429368 → link
    // (2,200): same as (1,200) by construction (seg agree, Δ0 bal) → link
    // block nat=2: (300,301): seg differ, bal Δ500, key near
    //   → -2079442-1558145+847298 = -2790289 → nonlink
    val c = customers(Seq(
      (1L, 1, "AUTO", 100.0), (2L, 1, "AUTO", 110.0),
      (200L, 1, "AUTO", 110.0), (300L, 2, "AUTO", 0.0),
      (301L, 2, "STEEL", 500.0)))
    val out = Inference.q167FellegiSunterOn(c)
      .as[(Long, Long, Long, String, Long, Long, Long)].collect()
    val scores = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(scores((1L, 2L)) === (5123964L, "link"))
    assert(scores((1L, 200L)) === (3429368L, "link"))
    assert(scores((2L, 200L)) === (3429368L, "link"))
    assert(scores((300L, 301L)) === (-2790289L, "nonlink"))
    // the histogram columns are global and identical on every row
    assert(out.map(r => (r._5, r._6, r._7)).toSet === Set((3L, 0L, 1L)))
  }

  // --- q170 backtest -----------------------------------------------

  test("q170: hand-scored seasonal-naive and naive-1 forecasts") {
    // weekly-periodic series 1,2,3,4,5,6,7,1,2,...: seasonal-naive-7 is
    // PERFECT (mae=0, smape=0); naive-1 errs |Δ|=1 on 6 of 7 days and
    // |7−1|=6 on the wrap day.
    val rows = for {
      day <- 0 to 13
      k <- 0 until (day % 7 + 1)
    } yield (1L, day, k.toLong + 1, "per", 0.0)
    val out = Inference.q170BacktestOn(events(rows))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(out("seasonal_naive_7") === ((7L, 0L, 0L)))
    // naive_1 over eval days 8..14 (a=2..7,1): preds 1..7 →
    // abs errs 1,1,1,1,1,1,6 → sae=12 → mae=12e6/7=1714285
    // smape terms: |Δ|*2e6/(p+a): 2e6/3,2e6/5,2e6/7,2e6/9,2e6/11,
    // 2e6/13, 12e6/8 → floor each, mean floored
    val sm = Seq(2000000L / 3, 2000000L / 5, 2000000L / 7, 2000000L / 9,
      2000000L / 11, 2000000L / 13, 12000000L / 8)
    assert(out("naive_1") === ((7L, 12000000L / 7, sm.sum / 7)))
  }

  // --- q171 quantile normalization ---------------------------------

  test("q171: per-source deciles are uniform and rank-exact") {
    // source A: 20 docs, lengths 1..20 → two docs per decile exactly.
    // rank 20 → pr_ppm = 19e6/19 = 1e6 → least(10, 9) = decile 9.
    val docs = (1 to 20).map(i => (i.toLong, "A", "x" * i, i.toLong))
      .toDF("doc_id", "source", "text", "n_chars")
    val out = Inference.q171QuantileNormOn(docs)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length === 10)
    assert(out.forall(_._3 === 2L), "every decile must hold exactly 2 docs")
    val d9 = out.find(_._2 === 9L).get
    assert((d9._4, d9._5) === ((19L, 20L)))
  }

  test("q171: a single-doc source is excluded (undefined percentile)") {
    val docs = Seq((1L, "solo", "abc", 3L), (2L, "big", "a", 1L),
      (3L, "big", "ab", 2L)).toDF("doc_id", "source", "text", "n_chars")
    val out = Inference.q171QuantileNormOn(docs)
      .select("source").distinct().as[String].collect().toSet
    assert(out === Set("big"))
  }

  // --- q172 k-anonymity --------------------------------------------

  test("q172: class-size histogram and at-risk flag by hand") {
    // QI (nat=1, AUTO, bal_k=1): 5 rows → class_size 5, not at risk
    // QI (nat=1, AUTO, bal_k=2): 2 rows → at risk
    // QI (nat=2, STEEL, bal_k=0): 1 row → at risk
    val c = (
      (1 to 5).map(i => (i.toLong, 1, "AUTO", 1500.0)) ++
        Seq((6L, 1, "AUTO", 2100.0), (7L, 1, "AUTO", 2900.0),
          (8L, 2, "STEEL", 100.0)))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Inference.q172KAnonymityOn(c)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(out === Set((5L, 1L, 5L, false), (2L, 1L, 2L, true),
      (1L, 1L, 1L, true)))
  }

  test("q172: negative balances floor toward -inf, not toward zero") {
    // -500 and +500 must land in DIFFERENT buckets (-1 vs 0): a
    // truncating cast would merge them into bucket 0
    val c = Seq((1L, 1, "AUTO", -500.0), (2L, 1, "AUTO", 500.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Inference.q172KAnonymityOn(c)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(out === Set((1L, 2L, 2L, true)),
      "expected two singleton classes — buckets merged")
  }

  // --- q173 concentration ------------------------------------------

  test("q173: uniform source has HHI=1/n and Gini≈0; monopoly has HHI→1") {
    // "uni": 4 docs × 100 chars → shares 1/4 → hhi = 250000 ppm,
    //   gini = (2*(1+2+3+4)*100 − 5*400)/(4*400) = 0
    // "mono": 99.7% of mass in one doc → hhi ≈ 994011, gini high
    val docs = (
      (1 to 4).map(i => (i.toLong, "uni", "t", 100L)) ++
        Seq((10L, "mono", "t", 1L), (11L, "mono", "t", 997L)))
      .toDF("doc_id", "source", "text", "n_chars")
    val out = Inference.q173ConcentrationOn(docs)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("uni") === ((4L, 400L, 250000L, 0L)))
    // mono: shares 1/998 and 997/998: hhi = (1+994009)*1e6/996004
    val hhi = (1L + 997L * 997L) * 1000000L / (998L * 998L)
    // gini = (2*(1*1+2*997) − 3*998)*1e6/(2*998)
    val gini = (2L * (1L + 2L * 997L) - 3L * 998L) * 1000000L / (2L * 998L)
    assert(out("mono") === ((2L, 998L, hhi, gini)))
  }

  // --- q168 dataset diff -------------------------------------------

  test("q168: hand-classified add/remove/change/same statuses") {
    // doc_id 7: in B only (7%7=0 drops it from A) → added
    // doc_id 5: in A only (5%5=0 drops it from B) → removed
    // doc_id 11: in both, B text edited (11%11=0) → changed
    // doc_id 3: in both, untouched → same
    // doc_id 35: dropped from BOTH (35%7=0 and 35%5=0) → absent
    val docs = Seq(
      (7L, "web", "seven"), (5L, "web", "five"), (11L, "web", "eleven"),
      (3L, "book", "three"), (35L, "web", "both-dropped"))
      .toDF("doc_id", "source", "text")
    val out = Inference.q168DatasetDiffOn(docs)
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("web", "added", 1L), ("web", "removed", 1L),
      ("web", "changed", 1L), ("book", "same", 1L)))
  }

  // --- q190 entity golden record -----------------------------------

  test("q190: link chains merge transitively; survivorship picks modal seg + max cents") {
    // With the published weights, a link REQUIRES segment agreement +
    // balance within 50 (key proximity alone cannot reach the
    // threshold). nation 1: (1,2) link (diff 10) and (2,3) link
    // (diff 45) but (1,3) is NOT a link (diff 55) — the entity {1,2,3}
    // exists only through the transitive closure. key 50: same nation,
    // far balance, own segment -> singleton. nation 2: plain pair.
    val cust = Seq(
      (1L, 1L, "A", 300.0), (2L, 1L, "A", 310.0), (3L, 1L, "A", 355.0),
      (50L, 1L, "C", 9000.0),
      (10L, 2L, "B", 100.0), (11L, 2L, "B", 110.0)
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Inference.q190EntityGoldenOn(cust).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 3L, "A", 35500L),
      (50L, 1L, "C", 900000L),
      (10L, 2L, "B", 11000L)), s"got $got")
  }

  // --- q187 Bradley-Terry ------------------------------------------

  test("q187: transitive dominance orders ratings c > b > a") {
    // 30 users, each one (loser, winner) transition: 10x b-after-a
    // (b beats a), 10x c-after-b, 10x c-after-a
    val rows = (0 until 10).flatMap { k =>
      Seq(
        (100L + k, 0, 10L, "a", 1.0), (100L + k, 0, 20L, "b", 1.0),
        (200L + k, 0, 10L, "b", 1.0), (200L + k, 0, 20L, "c", 1.0),
        (300L + k, 0, 10L, "a", 1.0), (300L + k, 0, 20L, "c", 1.0))
    }
    val got = Inference.q187BradleyTerryOn(events(rows)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("a", "b", "c"))
    assert(got("c") > got("b") && got("b") > got("a"), s"ordering: $got")
    // a never wins -> its MM rating is exactly 0 in the integer scheme
    assert(got("a") == 0L)
  }

  test("q187: distributed MM iteration equals a driver-side BigInt replica bit-for-bit") {
    // richer planted tournament with upsets so every item has wins
    val plantedPairs = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("b", "a"))
    val rows = (0 until 12).flatMap { k =>
      val (l, w) = plantedPairs(k % plantedPairs.size)
      Seq((500L + k, 0, 10L, l, 1.0), (500L + k, 0, 20L, w, 1.0))
    }
    val got = Inference.q187BradleyTerryOn(events(rows)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // wins table straight off the planted pairs: winner w beat loser l
    val winCount = (0 until 12).map(k => plantedPairs(k % plantedPairs.size))
      .groupBy(identity).map { case ((l, w), xs) => (w, l) -> xs.size.toLong }
    val items = winCount.keys.flatMap(t => Seq(t._1, t._2)).toSeq.distinct.sorted
    val matches = (for {
      i <- items; j <- items if i != j
      m = winCount.getOrElse((i, j), 0L) + winCount.getOrElse((j, i), 0L)
      if m > 0
    } yield (i, j) -> m).toMap
    val wins = items.map(i =>
      i -> winCount.collect { case ((w, _), n) if w == i => n }.sum).toMap
    var r = items.map(i => i -> BigInt(1000000)).toMap
    for (_ <- 1 to Inference.BtRounds) {
      val denom = items.map { i =>
        i -> items.collect {
          case j if matches.contains((i, j)) =>
            BigInt(matches((i, j))) * BigInt("1000000000000") / (r(i) + r(j))
        }.sum
      }.toMap
      val raw = items.map(i =>
        i -> BigInt(wins(i)) * BigInt("1000000000000") / denom(i)).toMap
      val s = raw.values.sum
      r = items.map(i => i -> raw(i) * items.size * 1000000 / s).toMap
    }
    items.foreach { i =>
      assert(BigInt(got(i)) == r(i), s"rating for $i: ${got(i)} != ${r(i)}")
    }
  }
}
