package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Behavioral invariants for the analytics batch (q86–q90), beyond the
  * DuckDB oracle equivalence the driver checks. */
class AnalyticsSpec extends SparkTestBase {

  test("profiler: planted nulls counted, min/max rendered, approx within 5%") {
    import spark.implicits._
    val df = (1 to 1000).map(i =>
      (if (i % 10 == 0) None else Some(i.toLong), s"v${i % 7}"))
      .toDF("num", "cat")
    val exact = graft.operators.Profiler.profile(df, Seq("num", "cat"), exact = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact("num").getLong(1) == 1000)  // n_rows
    assert(exact("num").getLong(3) == 100)   // n_null
    assert(exact("num").getLong(4) == 900)   // n_distinct
    assert(exact("num").getString(5) == "1" && exact("num").getString(6) == "999")
    assert(exact("cat").getLong(3) == 0 && exact("cat").getLong(4) == 7)
    assert(exact("cat").getString(5) == "v0" && exact("cat").getString(6) == "v6")
    val approx = graft.operators.Profiler.profile(df, Seq("num"))
      .collect().head.getLong(4)
    assert(math.abs(approx - 900) <= 45, s"approx distinct $approx vs 900")
  }

  private val dir = "/root/testdata/sf0.001"

  test("q86: residuals within a (type, dow) cell sum to the division remainder") {
    // mean is the truncated integral division, so Σ residual_micro over a
    // cell = Σcnt·1e6 − n·mean_micro ∈ [0, n) — exactness check of the
    // integer scheme (a double mean would drift).
    val bad = Analytics.q86Deseasonalize(spark, dir)
      .groupBy("event_type", "dow")
      .agg(sum("residual_micro").as("r"), count(lit(1)).as("n"))
      .where(col("r") < 0 || col("r") >= col("n"))
      .count()
    assert(bad == 0)
  }

  test("q87: correlations are in [-1, 1] and n = number of active days") {
    val df = Analytics.q87SeriesCorr(spark, dir).cache()
    val days = graft.sources.Tables.events(spark, dir)
      .select(to_date(col("ts"))).distinct().count()
    assert(df.where(abs(col("pearson_r")) > 1.0).count() == 0)
    assert(df.select("n").distinct().collect().map(_.getLong(0)).toSeq == Seq(days),
      "dense spine must give every series the same day count")
    df.unpersist()
  }

  test("q88: each row of the transition matrix sums to ~1 (truncation only)") {
    val bad = Analytics.q88Transitions(spark, dir)
      .groupBy("prev")
      .agg(sum("prob_micro").as("p"), count(lit(1)).as("k"))
      .where(col("p") > 1000000L || col("p") <= lit(1000000L) - col("k"))
      .count()
    assert(bad == 0)
  }

  test("q91: runs collapse (no consecutive equal states) and exactly one open interval per user") {
    val df = Analytics.q91Scd2(spark, dir).cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val sameRun = df
      .withColumn("next_state", lead("state", 1).over(w))
      .where(col("next_state").isNotNull && col("next_state") === col("state"))
      .count()
    assert(sameRun == 0, "consecutive versions with identical state must merge")
    val open = df.groupBy("user_id").agg(sum("is_current").as("n_open"))
      .where(col("n_open") =!= 1).count()
    assert(open == 0, "each user has exactly one current interval")
    // intervals chain: valid_to of version v is valid_from of v+1
    val chained = df
      .withColumn("next_from", lead("valid_from_us", 1).over(w))
      .where(col("next_from").isNotNull && col("valid_to_us") =!= col("next_from"))
      .count()
    assert(chained == 0, "validity intervals must tile the timeline")
    df.unpersist()
  }

  test("q91: the two window passes share ONE shuffle (exchange reuse)") {
    val p = Analytics.q91Scd2(spark, dir).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected a single user_id shuffle, got $exchanges:\n" + p.take(1200))
  }

  test("q92: χ² is non-negative and dof matches the margins") {
    val row = Analytics.q92ChiSquare(spark, dir).collect().head
    val chi2 = row.getAs[Double]("chi2")
    assert(chi2 >= 0.0)
    val types = graft.sources.Tables.events(spark, dir)
      .select("event_type").distinct().count()
    val dows = graft.sources.Tables.events(spark, dir)
      .select(dayofweek(to_date(col("ts")))).distinct().count()
    assert(row.getAs[Long]("dof") == (types - 1) * (dows - 1))
  }

  test("q93: tombstoned keys are deleted; every surviving key carries its latest state") {
    val df = Analytics.q93MergeUpsert(spark, dir).cache()
    // no user whose newest post-split state is 'error' survives
    assert(df.where(col("action").isin("update", "insert") &&
      col("state") === "error").count() == 0)
    // actions partition the keyspace: keep ⇒ absent from source, insert ⇒ absent from target
    val acts = df.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(acts.keySet.subsetOf(Set("update", "insert", "keep")))
    df.unpersist()
  }

  test("q94: grouping sets emit exactly the requested granularities") {
    val df = Analytics.q94GroupingSets(spark, dir).cache()
    val gids = df.select("gid").distinct().collect().map(_.getLong(0)).toSet
    // (flag,status)=0, (flag)=1, ()=3 — never 2 ((status) alone not requested)
    assert(gids == Set(0L, 1L, 3L), gids.toString)
    assert(df.where(col("gid") === 3).count() == 1, "one grand-total row")
    df.unpersist()
  }

  test("q90: at most k terms per doc, ranked by the quantized score") {
    val df = Analytics.q90Tfidf(spark, dir, k = 3).cache()
    assert(df.groupBy("doc_id").count().where(col("count") > 3).count() == 0)
    assert(df.where(col("score_micro") < 0).count() == 0, "smooth idf is ≥ 0")
    // rank 1 dominates rank 2 within a doc (ties broken by term ⇒ ≥)
    val inverted = df.where(col("rk") === 1).select(col("doc_id"), col("score_micro").as("s1"))
      .join(df.where(col("rk") === 2).select(col("doc_id"), col("score_micro").as("s2")), "doc_id")
      .where(col("s2") > col("s1")).count()
    assert(inverted == 0)
    df.unpersist()
  }

  test("q134: every planted constraint violation is counted exactly once") {
    import spark.implicits._
    // rows: ok, null orderkey, dup (okey, line), negative qty, bad flag,
    // orphan okey (no orders row)
    val li = Seq(
      (Option(1L), 1, 5.0, "A"),
      (Option.empty[Long], 1, 5.0, "N"), // orderkey_complete
      (Option(2L), 1, 5.0, "R"),
      (Option(2L), 1, 5.0, "R"),         // line_id_unique (dup of previous)
      (Option(3L), 1, -2.0, "N"),        // quantity_non_negative
      (Option(4L), 1, 5.0, "X"),         // returnflag_in_domain
      (Option(9L), 1, 5.0, "A")          // orderkey_references_orders
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val orders = Seq(1L, 2L, 3L, 4L).toDF("o_orderkey")
    val out = Analytics.q134TableConstraintsOn(li, orders)
      .select("rule", "violations", "pass")
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out("row_count_positive") == (("row_count_positive", 0L, true)))
    assert(out("orderkey_complete") == (("orderkey_complete", 1L, false)))
    assert(out("line_id_unique") == (("line_id_unique", 1L, false)))
    assert(out("quantity_non_negative") == (("quantity_non_negative", 1L, false)))
    assert(out("returnflag_in_domain") == (("returnflag_in_domain", 1L, false)))
    // null FK rows fail BOTH completeness and referential integrity
    // (anti-join keeps them: null never matches) — so orphans = null row
    // + okey 9, deterministically in both engines
    assert(out("orderkey_references_orders") ==
      (("orderkey_references_orders", 2L, false)))
  }

  test("q135: closed-form CUSUM equals the Page recursion; a level shift flags") {
    import spark.implicits._
    // 30 quiet days at ~10 events, then a sustained outbreak at 40
    val series = (1 to 30).map(d => (f"2024-01-$d%02d", 10L + (d % 3))) ++
      (1 to 10).map(d => (f"2024-02-$d%02d", 40L))
    val daily = series.map { case (dt, n) => (java.sql.Date.valueOf(dt), "R0", n) }
      .toDF("date", "region", "n")
    val out = Analytics.q135CusumOnDaily(daily)
      .orderBy("date").select("date", "cusum_scaled", "flag")
      .as[(String, Long, Boolean)].collect()
    // independent ground truth: the textbook recursion s_i = max(0, s + N·x − S)
    val n = series.map(_._2)
    val (nn, s) = (n.length.toLong, n.sum)
    val expected = n.scanLeft(0L)((acc, x) => math.max(0L, acc + nn * x - s)).tail
    assert(out.map(_._2).sameElements(expected),
      s"closed form diverged from the recursion:\n${out.map(_._2).toSeq}\nvs $expected")
    // quiet period never flags; the outbreak does
    assert(out.take(30).forall(!_._3), "false alarm in the quiet period")
    assert(out.last._3, "sustained shift never flagged")
  }

  test("q143: planted phrases count overlaps, adjacency, and positions exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "big data big data wins"),   // two matches, first at pos 1
      (2L, "big big data"),             // one match at pos 2 (not pos 1)
      (3L, "data big"),                 // reversed — no match
      (4L, "big nosql data"),           // gap — no match
      (5L, "x big data")                // one match at pos 2
    ).toDF("doc_id", "text")
    val out = Analytics.q143PhraseSearchOn(docs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> (2L, 1L), 2L -> (1L, 2L), 5L -> (1L, 2L)))
  }

  test("q144: planted skew yields exact share and max/mean ratio") {
    import spark.implicits._
    // key 7 appears 10 times; keys 1..5 once each -> total 15, n_keys 6
    val events = (Seq.fill(10)(7L) ++ (1L to 5L)).map(u => (u, "e"))
      .toDF("user_id", "event_type")
    val rows = Analytics.q144SkewProfileOn(events).collect()
    assert(rows.length == 6)
    val byKey = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // share of key 7 = 10/15 -> 666_666 ppm; skew = 10*6/15 -> 4_000_000
    assert(byKey(7L) == (10L, 666666L, 6L, 10L, 4000000L))
    assert(byKey(1L)._2 == 66666L) // 1/15 in ppm, floored
  }

  test("q144: skew ratio exact in the Long-overflow regime (100 TB counts)") {
    import spark.implicits._
    // max_cnt·n_keys·1e6 = 4e18·3·1e6 ≈ 1.2e25 — far past Long.MaxValue
    // (9.2e18); the decimal(38,0) product must still divide exactly.
    val counts = Seq((7L, 4000000000000000000L), (1L, 1000000000000000000L),
      (2L, 1000000000000000000L)).toDF("user_id", "cnt")
    val r = Analytics.skewProfileOfCounts(counts)
      .where($"user_id" === 7L).collect().head
    // total 6e18, skew = 4e18*3*1e6/6e18 = 2_000_000
    assert(r.getLong(5) == 2000000L, s"overflowed: ${r.getLong(5)}")
    assert(r.getLong(2) == 666666L) // share_ppm path still in-range
  }

  test("q145: uniform column hits ln(k), constant column hits 0") {
    val rows = Analytics.q145ColumnEntropy(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("event_type", "user_id", "day"))
    for ((_, (n, nd, h)) <- rows) {
      assert(h >= 0L, "entropy must be non-negative")
      // H <= ln(n_distinct) up to the micro-snap of each term
      val hMax = math.round(math.log(nd.toDouble) * 1e6)
      assert(h <= hMax + nd, s"entropy $h above ln(distinct) $hMax")
      assert(nd <= n)
    }
    // high-cardinality user_id must carry more entropy than the small
    // event-type alphabet on the synthetic data
    assert(rows("user_id")._3 > rows("event_type")._3)
  }

  test("q146: distributed Holt fold equals the driver-side recursion bit-for-bit") {
    import spark.implicits._
    val out = Analytics.q146Holt(spark, dir)
      .orderBy("region", "date")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    for ((_, rows) <- out.groupBy(_._1)) {
      val ns = rows.sortBy(_._2).map(_._3)
      // Spark round() semantics (HALF_UP) — math.round drifts on
      // .5-adjacent values, which negative trends can hit
      def snap(x: Double) = java.math.BigDecimal.valueOf(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      var l = 0.0; var b = 0.0
      val want = ns.zipWithIndex.map { case (n, i) =>
        if (i == 0) { l = n.toDouble; b = 0.0 }
        else {
          val l2 = (n.toDouble + l + b) / 2.0
          b = (l2 - l + b) / 2.0
          l = l2
        }
        (snap(l), snap(b), snap(l + b))
      }
      assert(rows.sortBy(_._2).map(r => (r._4, r._5, r._6)).sameElements(want))
    }
    // on drifting series the forecast leads the level in trend direction
    val trending = out.filter(_._5 != 0L)
    assert(trending.forall(r => (r._6 - r._4).sign == r._5.sign))
  }

  /** Events frame with exactly `counts(i)` rows on day 2024-01-01+i,
    * all user_id 0 (one region R0). */
  private def plantedDaily(counts: Seq[Int]) = {
    import spark.implicits._
    val day0 = 1704067200000L // 2024-01-01T00:00Z
    counts.zipWithIndex.flatMap { case (c, i) =>
      (0 until c).map(j =>
        (new java.sql.Timestamp(day0 + i * 86400000L + j * 1000L), 0L))
    }.toDF("ts", "user_id")
  }

  test("q181: constant series gives exactly flat level and zero trend/seasonal") {
    // y = 4 forever: l0 = 4, all s_i = 0, and the recurrences are exact
    // fixed points — every emitted row must be EXACTLY (4e6, 0, 0, 4e6)
    val out = Analytics.q181HoltWintersOn(plantedDaily(Seq.fill(21)(4)))
      .orderBy("date").collect()
    assert(out.length == 14) // 21 days minus the 7-day init window
    out.foreach { r =>
      assert(r.getLong(3) == 4000000L && r.getLong(4) == 0L &&
        r.getLong(5) == 0L && r.getLong(6) == 4000000L, s"not flat: $r")
    }
  }

  test("q181: exactly weekly-periodic series is forecast perfectly one step ahead") {
    // y cycles (8,16,24,32,40,48,56): init means the seasonals absorb the
    // whole cycle exactly, the level/trend recurrences are fixed points,
    // and forecast(t) = y(t+1) EXACTLY — the decomposition q146's Holt
    // cannot achieve on seasonal data (its spec only bounds direction)
    val cycle = Seq(8, 16, 24, 32, 40, 48, 56)
    val counts = Seq.fill(3)(cycle).flatten
    val out = Analytics.q181HoltWintersOn(plantedDaily(counts))
      .orderBy("date").collect()
    assert(out.length == 14)
    out.zipWithIndex.dropRight(1).foreach { case (r, i) =>
      val nextY = counts(7 + i + 1).toLong * 1000000L
      assert(r.getLong(6) == nextY, s"forecast row $i: ${r.getLong(6)} != $nextY")
    }
  }

  test("q181: distributed flatMapGroups fold equals the driver-side recursion bit-for-bit") {
    import spark.implicits._
    val out = Analytics.q181HoltWinters(spark, dir)
      .orderBy("region", "date")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // independent dense daily series straight off the table
    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"),
        concat(lit("R"), (col("user_id") % 5).cast("string")).as("region"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("d"), col("region"), col("n"))
      .as[(String, String, Long)].collect()
    val days = daily.map(_._1).distinct.sorted
    def snap(x: Double) = java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    for ((region, rows) <- out.groupBy(_._1)) {
      val byDay = daily.filter(_._2 == region).map(t => t._1 -> t._3).toMap
      val y = days.map(d => byDay.getOrElse(d, 0L).toDouble)
      val l0 = days.take(7).map(d => byDay.getOrElse(d, 0L)).sum.toDouble / 7.0
      val ring = Array.tabulate(7)(i => y(i) - l0)
      var l = l0; var b = 0.0
      val want = (7 until days.length).map { t =>
        val sLag = ring(t % 7)
        val lN = ((y(t) - sLag) + (l + b)) / 2.0
        val bN = ((lN - l) + b) / 2.0
        val sN = ((y(t) - lN) + sLag) / 2.0
        ring(t % 7) = sN; l = lN; b = bN
        (days(t), snap(lN), snap(bN), snap(sN), snap(lN + bN + ring((t + 1) % 7)))
      }
      val got = rows.sortBy(_._2).map(r => (r._2, r._4, r._5, r._6, r._7)).toSeq
      assert(got == want, s"region $region Holt-Winters drifted")
    }
  }

  test("q188: pure weekly pattern scores 1.0, constant series is null, flat-noise low") {
    import spark.implicits._
    // type "week": counts cycle (2,4,6,8,10,12,14) by weekday over 4 weeks
    // -> dow means are exact, residuals all 0 -> strength exactly 1e6.
    // type "flat": constant 5 -> zero total variance -> NULL.
    // 2024-01-01 is a Monday; 28 days = 4 exact weeks either way.
    val day0 = 1704067200000L
    def rows(t: String, counts: Int => Int) =
      (0 until 28).flatMap(i => (0 until counts(i)).map(j =>
        (new java.sql.Timestamp(day0 + i * 86400000L + j * 1000L), t)))
    val ev = (rows("week", i => 2 * (i % 7) + 2) ++ rows("flat", _ => 5))
      .toDF("ts", "event_type")
    val got = Analytics.q188SeasonalStrengthOn(ev).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(got("week") == Some(1000000L), s"weekly: ${got("week")}")
    assert(got("flat").isEmpty, "constant series must yield NULL strength")
  }

  test("q147: MI is ~0 for independent columns and large for dependent ones") {
    // the real-table single row first: joint entropy bounded by marginals
    val r = Analytics.q147MutualInfo(spark, dir).collect().head
    val (ha, hb, hj, mi) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(hj <= ha + hb + 2 && mi >= -2, s"entropy identity violated: $r")
    assert(mi == ha + hb - hj)
  }

  test("q141: distributed fold equals the driver-side EWMA recursion bit-for-bit") {
    import spark.implicits._
    val out = Analytics.q141Ewma(spark, dir)
      .orderBy("region", "date")
      .as[(String, String, Long, Long)].collect()
    assert(out.nonEmpty)
    // independent ground truth per region, same α=1/2 recursion on the
    // collected daily counts
    val byRegion = out.groupBy(_._1)
    for ((_, rows) <- byRegion) {
      val ns = rows.sortBy(_._2).map(_._3)
      var s = 0.0
      val want = ns.zipWithIndex.map { case (n, i) =>
        s = if (i == 0) n.toDouble else (s + n.toDouble) / 2.0
        math.round(s * 1e6)
      }
      assert(rows.sortBy(_._2).map(_._4).sameElements(want))
    }
  }
}
