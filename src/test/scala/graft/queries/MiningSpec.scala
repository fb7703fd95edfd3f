package graft.queries

import graft.SparkTestBase
import graft.operators.CountMinSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pattern-mining family (q156–q159): FPGrowth / PrefixSpan output
  * checked against brute-force re-derivations with planted patterns,
  * Count-Min against its no-underestimate contract, and the
  * concurrency sweep against hand-computed intervals. */
class MiningSpec extends SparkTestBase {
  import spark.implicits._

  /** (user, secondOfDay offset, type) → events rows on two fixed days. */
  private def events(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.zipWithIndex.map { case ((u, off, t), i) =>
      (i.toLong, new java.sql.Timestamp(1577836800000L + off * 1000), u, t)
    }.toDF("event_id", "ts", "user_id", "event_type")

  // --- q156 FPGrowth ------------------------------------------------

  /** Brute-force frequent pairs with the same ceil threshold. */
  private def brutePairs(ev: DataFrame, minSup: Double): Set[(String, String, Long)] = {
    val b = ev.select(col("user_id"), to_date(col("ts")).as("d"),
      col("event_type")).distinct()
    val nb = b.select("user_id", "d").distinct().count()
    val minCount = math.ceil(minSup * nb).toLong
    val l = b.as("x").join(b.as("y"),
        $"x.user_id" === $"y.user_id" && $"x.d" === $"y.d" &&
          $"x.event_type" < $"y.event_type")
      .groupBy($"x.event_type".as("a"), $"y.event_type".as("b"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
      .as[(String, String, Long)].collect()
    l.toSet
  }

  test("q156: FPGrowth pairs equal the brute-force basket self-join") {
    // planted: (u1,day1) fires {a,b,c}; (u2,day1) {a,b}; (u3,day1) {a,c};
    // (u1,day2) {b,c}. Baskets: 4. Pair counts: ab=2, ac=2, bc=2.
    val ev = events(Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 10L, "a"), (2L, 20L, "b"),
      (3L, 10L, "a"), (3L, 20L, "c"),
      (1L, 86410L, "b"), (1L, 86420L, "c")))
    // minSupport 0.4 → minCount ceil(1.6)=2 → all three pairs survive;
    // 0.6 → minCount 3 → none survive (discrimination proven both ways)
    for (sup <- Seq(0.4, 0.6)) {
      val got = Mining.q156FrequentPairsOn(ev, sup)
        .as[(String, String, Long)].collect().toSet
      assert(got === brutePairs(ev, sup), s"minSupport=$sup")
    }
  }

  test("q156: full itemset lattice matches brute-force subset counting") {
    val ev = events(Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 10L, "a"), (2L, 20L, "b"), (2L, 30L, "c"),
      (3L, 10L, "a"), (3L, 20L, "b")))
    val baskets = ev.groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(collect_set(col("event_type")).as("items"))
    val sets = baskets.select("items").as[Seq[String]].collect()
      .map(_.toSet)
    // every nonempty subset with count >= ceil(0.5 * 3) = 2
    val all = sets.flatMap(_.subsets().filter(_.nonEmpty)).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toMap
    val model = new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("items").setMinSupport(0.5).fit(baskets)
    val mined = model.freqItemsets
      .select(col("items"), col("freq")).as[(Seq[String], Long)]
      .collect().map { case (is, f) => is.toSet -> f }.toMap
    assert(mined === all)
  }

  // --- q157 Count-Min -----------------------------------------------

  test("q157: count-min never under-estimates and bounds the sketch size") {
    val ev = (1 to 500).map(i => (i.toLong % 37, "x")).toDF("user_id", "t")
    val sketch = CountMinSketch.build(ev, "user_id")
    assert(sketch.count() <= CountMinSketch.depth.toLong * CountMinSketch.width)
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
    val est = CountMinSketch.estimate(sketch, exact, "user_id")
      .select("user_id", "n_exact", "est").as[(Long, Long, Long)].collect()
    assert(est.length === 37)
    est.foreach { case (k, ex, e) =>
      assert(e >= ex, s"under-estimate for key $k: est $e < exact $ex")
    }
  }

  test("q157: a planted heavy hitter's estimate is exact when collisions are absent") {
    // 40 distinct keys in a 1024-bucket sketch: collision probability is
    // low but not zero — assert the guaranteed side (est >= exact) and
    // that the heavy key's estimate is within the worst-case bound
    // (total stream mass).
    val rows = Seq.fill(300)(7L) ++ (1L to 39L)
    val ev = rows.map((_, "x")).toDF("user_id", "t")
    val sketch = CountMinSketch.build(ev, "user_id")
    val heavy = Seq(7L).toDF("user_id")
    val e = CountMinSketch.estimate(sketch, heavy, "user_id")
      .select("est").as[Long].head()
    assert(e >= 300L && e <= 339L)
  }

  // --- q158 PrefixSpan ----------------------------------------------

  test("q158: PrefixSpan pairs equal the brute-force positional self-join") {
    // u1: a b a c  → subsequence pairs {ab, aa, ac, ba, bc}
    // u2: b a     → {ba}
    // u3: c c     → {cc}
    val ev = events(Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "a"), (1L, 40L, "c"),
      (2L, 10L, "b"), (2L, 20L, "a"),
      (3L, 10L, "c"), (3L, 20L, "c")))
    // 3 sequences; minSupport 0.3 → minCount 1: every observed pair
    val got = Mining.q158SeqPatternsOn(ev, 0.3)
      .as[(String, String, Long)].collect().toSet
    val expected = Set(
      ("a", "b", 1L), ("a", "a", 1L), ("a", "c", 1L),
      ("b", "a", 2L), ("b", "c", 1L), ("c", "c", 1L))
    assert(got === expected)
    // minSupport 0.6 → minCount 2: only the cross-user pattern survives
    val strict = Mining.q158SeqPatternsOn(ev, 0.6)
      .as[(String, String, Long)].collect().toSet
    assert(strict === Set(("b", "a", 2L)))
  }

  test("q158: same-second events order by event_id, matching the oracle's tiebreak") {
    // both events at offset 10 — event_id 0 ("x") precedes event_id 1
    // ("y"), so <x,y> is the only pattern, never <y,x>
    val ev = events(Seq((1L, 10L, "x"), (1L, 10L, "y")))
    val got = Mining.q158SeqPatternsOn(ev, 0.5)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("x", "y", 1L)))
  }

  // --- q159 concurrency sweep ---------------------------------------

  test("q159: hand-computed interval concurrency, day-partitioned") {
    // day 0: [0,100], [50,150], [60,70] → peak 3; [200,210] disjoint
    // day 1: [86400, 86500] alone → peak 1
    val sess = Seq(
      (0L, 100L), (50L, 150L), (60L, 70L), (200L, 210L),
      (86400L, 86500L)).toDF("start_s", "end_s")
    val got = Mining.q159ConcurrencyOn(sess)
      .select("day_idx", "max_concurrent").as[(Long, Long)]
      .collect().toMap
    assert(got === Map(0L -> 3L, 1L -> 1L))
  }

  // --- q161 join-size audit -----------------------------------------

  test("q161: predicted join cardinality equals the actually-run join's count") {
    // left: key 1×3, 2×1, 3×2; right: key 1×2, 3×4, 9×5 (9 unshared)
    val left = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val right = Seq(1L, 1L, 3L, 3L, 3L, 3L, 9L, 9L, 9L, 9L, 9L).toDF("k")
    val audit = Mining.q161JoinSizeAuditOn(left, right)
    val rows = audit.select("orderkey", "contrib", "total_join_rows",
      "n_shared_keys").as[(Long, Long, Long, Long)].collect()
    val actual = left.join(right, "k").count()
    assert(actual === 14L) // 3·2 + 2·4
    rows.foreach { case (_, _, total, nk) =>
      assert(total === actual); assert(nk === 2L)
    }
    assert(rows.map(r => r._1 -> r._2).toMap === Map(3L -> 8L, 1L -> 6L))
  }

  // --- q160 sorted neighborhood -------------------------------------

  test("q160: adjacent near-dups found, far-apart ones missed (O(n·w) bound is real)") {
    // keys sort as: aaaa…1 < aaaa…2 < kkkk… < zzzz…a < zzzz…b
    // window=2: (1,2) dist 1 hit; (4,5) dist 1 hit; 1↔4 never compared
    // (3 apart) even though their distance (24) could pass a loose gate;
    // the kkkk row is compared but fails the distance gate.
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaaa1 tail", "s1", "en"),
      (2L, "aaaaaaaaaaaaaaaaaaaaaaa2 tail", "s1", "en"),
      (3L, "kkkkkkkkkkkkkkkkkkkkkkkk tail", "s1", "en"),
      (4L, "zzzzzzzzzzzzzzzzzzzzzzza tail", "s1", "en"),
      (5L, "zzzzzzzzzzzzzzzzzzzzzzzb tail", "s1", "en"),
      // same key as doc 1 but a different block — never compared
      (6L, "aaaaaaaaaaaaaaaaaaaaaaa1 tail", "s2", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val got = Mining.q160SortedNeighborhoodOn(docs, window = 2, maxDist = 3)
      .select("a_id", "b_id", "edit_dist").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === Set((1L, 2L, 1L), (4L, 5L, 1L)))
  }

  test("q159: a session ending exactly when another starts still overlaps (inclusive end)") {
    val sess = Seq((0L, 100L), (100L, 200L)).toDF("start_s", "end_s")
    val got = Mining.q159ConcurrencyOn(sess)
      .select("max_concurrent").as[Long].head()
    assert(got === 2L)
  }

  test("q183: prefix-filter join equals the brute-force all-pairs join EXACTLY") {
    // 40 docs over a 12-word vocab: dense overlap, dozens of true pairs
    // at every Jaccard level — if the prefix scheme lost ANY pair >= 0.5
    // the set equality below fails
    val vocab = (1 to 12).map(i => s"w$i")
    val docs = (1L to 40L).map { i =>
      val k = 4 + (i % 5).toInt
      val toks = (0 until k).map(j => vocab(((i * 3 + j * 5) % 12).toInt)).distinct
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val sets = (1L to 40L).map { i =>
      val k = 4 + (i % 5).toInt
      i -> (0 until k).map(j => vocab(((i * 3 + j * 5) % 12).toInt)).toSet
    }.toMap
    val brute = (for {
      a <- 1L to 40L; b <- (a + 1) to 40L
      o = (sets(a) & sets(b)).size.toLong
      u = (sets(a) | sets(b)).size.toLong
      jm = o * 1000000L / u if jm >= Mining.PrefixTau
    } yield (a, b, jm)).toSet
    assert(brute.nonEmpty, "test corpus must contain true pairs")
    val got = Mining.q183PrefixJoinOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      s"missing=${brute -- got} spurious=${got -- brute}")
  }

  test("q183: degenerate corpus trips the pair budget LOUDLY") {
    // 200 near-identical docs over a 3-word vocab: every pair is a true
    // pair, candidate fan-out ~200²/2 — exactly the corpus the exact
    // join must refuse under a budget instead of emitting Ω(n²)
    val docs = (1L to 200L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Mining.q183PrefixJoinOn(docs, pairBudget = 1000L)
    }
    assert(e.getMessage.contains("pair budget") &&
      e.getMessage.contains("minhashLshKeep"),
      s"guard must point at the bounded alternative: ${e.getMessage}")
    // and the same corpus passes when the budget is raised deliberately
    val got = Mining.q183PrefixJoinOn(docs, pairBudget = 100000L)
    assert(got.count() == 200L * 199L / 2)
  }

  test("q183 pre-flight: the prediction upper-bounds the true pair count — dense AND sparse") {
    // DENSE corpus: every pair is a true pair; the prediction must
    // cover all of them BEFORE any pairing job runs
    val dense = (1L to 120L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val densePred = Mining.q183Preflight(dense)
    val denseTrue = Mining
      .q183PrefixJoinOn(dense, pairBudget = Long.MaxValue).count()
    assert(densePred >= denseTrue,
      s"pre-flight $densePred under-predicted $denseTrue true pairs")
    assert(denseTrue == 120L * 119L / 2) // it IS the quadratic case
    // SPARSE corpus (distinct vocabularies): prediction stays tiny —
    // the rail admits healthy corpora without a second thought
    val sparse = (1L to 120L)
      .map(i => (i, s"w${i}a w${i}b w${i}c w${i}d"))
      .toDF("doc_id", "text")
    val sparsePred = Mining.q183Preflight(sparse)
    val sparseTrue = Mining
      .q183PrefixJoinOn(sparse, pairBudget = Long.MaxValue).count()
    assert(sparsePred >= sparseTrue)
    assert(sparsePred == 0L,
      s"disjoint-vocab corpus predicted $sparsePred candidate pairs")
  }
}
