package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Planted-fixture proof for the curation operators: the sf corpora
  * contain no PII / contamination, so their oracle passes would be
  * trivially-all-zero without these. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("PII redaction finds and scrubs planted emails, phones, IPs") {
    val docs = Seq(
      (1L, "contact me at jane.doe+x@example.org or 555-123-4567 today"),
      (2L, "server at 10.0.0.1 and 192.168.1.254 responded"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val out = Curation.q63PiiRedactionOn(docs)
      .orderBy("doc_id")
      .select("n_email", "n_phone", "n_ip", "redacted")
      .as[(Int, Int, Int, String)].collect()
    assert(out(0) == ((1, 1, 0,
      "contact me at <EMAIL> or <PHONE> today")))
    assert(out(1)._3 == 2 && out(1)._4 == "server at <IP> and <IP> responded")
    assert(out(2) == ((0, 0, 0, "no pii here at all")))
  }

  test("boilerplate strip drops cross-doc chunks, keeps unique ones, in order") {
    // 8-token chunks; "c1..c8" is the planted boilerplate shared by docs
    // 1 and 2 at different chunk positions; doc 3 repeats a chunk only
    // WITHIN itself (not boilerplate by the ≥2-distinct-docs rule)
    val boiler = (1 to 8).map(i => s"c$i").mkString(" ")
    val u1 = (1 to 8).map(i => s"a$i").mkString(" ")
    val u2 = (1 to 8).map(i => s"b$i").mkString(" ")
    val u3 = (1 to 8).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, s"$u1 $boiler"),
      (2L, s"$boiler $u2"),
      (3L, s"$u3 $u3")).toDF("doc_id", "text")
    val out = Curation.q111BoilerplateStripOn(docs)
      .orderBy("doc_id")
      .select("n_chunks", "n_dropped", "clean_fp")
      .as[(Long, Long, String)].collect()
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0) == ((2L, 1L, fp(u1))), s"doc1: ${out(0)}")
    assert(out(1) == ((2L, 1L, fp(u2))), s"doc2: ${out(1)}")
    // within-doc repetition survives the cross-doc rule untouched
    assert(out(2) == ((2L, 0L, fp(s"$u3 $u3"))), s"doc3: ${out(2)}")
  }

  test("CDC chunking survives a single-token insertion; the fixed grid does not") {
    val text = (1 to 120).map(i => s"w${i * 7919 % 997}").mkString(" ")
    val docs = Seq((1L, text), (2L, s"zzz $text")).toDF("doc_id", "text")
    val cdc = Curation.q120CdcChunksOn(docs)
      .select("doc_id", "dup_ratio").as[(Long, Double)].collect().toMap
    // hash-derived boundaries re-synchronize right after the edit: most
    // chunks of the shifted doc still fingerprint-match the original
    assert(cdc(1L) > 0.5 && cdc(2L) > 0.5, s"CDC not insertion-robust: $cdc")
    // the fixed 8-token grid shifts every boundary after the insertion —
    // zero shared chunks, nothing stripped
    val grid = Curation.q111BoilerplateStripOn(docs)
      .select("doc_id", "n_dropped").as[(Long, Long)].collect().toMap
    assert(grid(1L) == 0L && grid(2L) == 0L,
      s"fixed grid unexpectedly aligned: $grid")
  }

  test("NFC normalization folds decomposed text onto the composed form") {
    val composed = "caf\u00e9 r\u00e9sum\u00e9"  // precomposed
    val decomposed = "cafe\u0301 re\u0301sume\u0301"  // combining acute
    val docs = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"))
      .toDF("doc_id", "text")
    val nfc = call_function("graft_nfc", col("text"))
    val out = docs
      .select(col("doc_id"), md5(nfc).as("fp"), (nfc === col("text")).as("already"))
      .orderBy("doc_id")
      .as[(Long, String, Boolean)].collect()
    assert(out(0)._2 == out(1)._2,
      "decomposed text must fingerprint identically to its composed form")
    assert(out(0)._3 && !out(1)._3 && out(2)._3)
    // expression stays inside whole-stage codegen (no UDF black box)
    val plan = docs.select(nfc).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan.take(400))
  }

  test("KMV overlap estimates track the exact audit within sketch error") {
    // sf0.1: 250 docs/source → pair unions ≈ 500 ≫ k=64, so this runs
    // the (n−1)·2⁶⁰/v_k ESTIMATOR branch, not the exact small-union
    // fallback (at sf0.01 every union is < k and the estimator formula
    // would ship untested — the oracle can't catch a wrong formula it
    // replicates)
    val dir = "/root/testdata/sf0.1"
    val exact = Curation.q117SourceOverlap(spark, dir)
      .select("source_a", "source_b", "n_a", "n_b", "n_shared")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val est = Curation.q118SourceOverlapKmv(spark, dir)
      .select("source_a", "source_b", "union_est", "jaccard_est")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (pair, (uEst, jEst)) =>
      val (na, nb, shared) = exact(pair)
      val union = na + nb - shared
      // KMV standard error ~ 1/sqrt(k-2): generous 3σ band at k=64
      assert(math.abs(uEst - union) <= union * 0.4 + 1,
        s"$pair union est $uEst vs exact $union")
      val jacc = shared.toDouble / union
      assert(math.abs(jEst - jacc) <= 0.25, s"$pair jaccard $jEst vs $jacc")
    }
  }

  test("contamination screen flags only docs sharing a benchmark 5-gram") {
    val bench = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, bench),                                            // benchmark (id < 20)
      (21L, s"prefix words then $bench and a suffix"),        // contaminated
      (22L, "five totally different tokens assembled here now ok"),
      (23L, "quick brown fox jumps over")                     // exact 5-gram hit
    ).toDF("doc_id", "text")
    val out = Curation.q64ContaminationOn(docs)
      .as[(Long, Long)].collect().toMap
    assert(out.contains(21L) && out(21L) >= 6) // sliding window of shared grams
    assert(out.contains(23L) && out(23L) == 1L)
    assert(!out.contains(22L))
    assert(!out.contains(1L), "benchmark docs must not screen themselves")
  }

  test("dup spans: planted shared 8-gram is found, unique text scores zero") {
    // doc 1 and doc 2 share one exact 8-token run; doc 3 repeats its own
    // 8-gram (self-duplication also counts); doc 4 is all-unique
    val shared = (1 to 8).map("s" + _).mkString(" ")
    val loop = (1 to 8).map("l" + _).mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three $shared x y z"),
      (3L, s"$loop filler $loop"),
      (4L, (1 to 20).map("u" + _).mkString(" "))
    ).toDF("doc_id", "text")
    val out = Curation.q105DupSpansOn(docs)
      .select("doc_id", "n_spans", "dup_spans")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: 12 tokens -> 5 windows, exactly 1 (the planted run) duplicated
    assert(out(1L) == ((5L, 1L)))
    assert(out(2L) == ((7L, 1L)))
    // doc 3: 17 tokens -> 10 windows; the two copies of `loop` are both
    // duplicated (positions 1 and 10), nothing else repeats
    assert(out(3L) == ((10L, 2L)))
    assert(out(4L) == ((13L, 0L)))
  }

  test("lm score: on-corpus text outscores off-corpus text") {
    // corpus dominated by one repeated sentence; a conformant doc's
    // bigrams are all high-count, an off-corpus doc's are all unseen-ish
    val common = "the cat sat on the mat"
    val docs = (1L to 20L).map(i => (i, common)) :+
      (21L, common) :+ (22L, "zebra quark flux jolt wisp nook")
    val out = Curation.q106LmScoreOn(docs.toDF("doc_id", "text"))
      .select("doc_id", "avg_lp_micro").as[(Long, Double)].collect().toMap
    assert(out(21L) > out(22L),
      s"on-corpus ${out(21L)} must beat off-corpus ${out(22L)}")
    // every repeat of the common sentence scores identically
    assert(out(1L) == out(21L))
  }

  test("repetition ratio: looping text scores high, diverse text zero") {
    val docs = Seq(
      (1L, Seq.fill(20)("buy now limited offer").mkString(" ")), // heavy loop
      (2L, (1 to 60).map("w" + _).mkString(" "))                 // all distinct
    ).toDF("doc_id", "text")
    val res = Curation.q65RepetitionOn(docs)
      .orderBy("doc_id").select("rep_ratio").as[Double].collect()
    assert(res(0) > 0.9, s"looping text scored ${res(0)}")
    assert(res(1) == 0.0)
  }

  test("tokenizer fertility: CJK shreds into per-char pieces, ASCII does not") {
    val docs = Seq(
      (1L, "hello world foo", "en"),   // 3 words → 3 alpha pieces
      (2L, "hello, world!", "en"),     // 2 words → 4 pieces (2 words + 2 punct)
      (3L, "你好 世界", "zh") // 2 words → 4 single-char pieces
    ).toDF("doc_id", "text", "lang")
    val out = Curation.q129TokenizerFertilityOn(docs)
      .select("lang", "n_words", "n_pieces", "n_bytes", "fertility")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("en") == (("en", 5L, 7L, 28L, 1.4)), s"en: ${out("en")}")
    // 4 CJK chars at 3 UTF-8 bytes each + 1 space
    assert(out("zh") == (("zh", 2L, 4L, 13L, 2.0)), s"zh: ${out("zh")}")
  }

  test("quality rules: each Gopher rule fails on its planted violator") {
    val good = Seq.fill(6)("the quick brown fox jumps over lazy dog and it")
      .mkString(" ")                                  // 60 words, stopword-rich
    val docs = Seq(
      (1L, good),
      (2L, "tiny doc"),                               // fails word count
      (3L, Seq.fill(60)("12345").mkString(" ")),      // fails alpha + stopwords
      (4L, Seq.fill(60)("supercalifragilistic").mkString(" ")), // fails mean len
      (5L, Seq.fill(30)("the dog").mkString(" "))     // ONE distinct stopword
    ).toDF("doc_id", "text")
    val out = Curation.q130QualityRulesOn(docs)
      .select("doc_id", "pass_words", "pass_word_len", "pass_alpha", "pass_stop", "pass_all")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, true, true, true, true, true)))
    assert(!out(2L)._2 && !out(2L)._6)
    assert(out(3L)._2 && !out(3L)._4 && !out(3L)._5 && !out(3L)._6)
    assert(out(4L)._2 && !out(4L)._3 && out(4L)._4 && !out(4L)._6)
    // the Gopher rule is DISTINCT stopwords: 30 copies of "the" ≠ 2 hits
    assert(out(5L)._2 && out(5L)._4 && !out(5L)._5 && !out(5L)._6)
  }

  test("ccnet buckets: terciles are score-ordered and short docs still route (to tail)") {
    // one lang, 10 docs: on-corpus (high LM score) → off-corpus → scoreless
    val common = "the cat sat on the mat"
    val docs = ((1L to 5L).map(i => (i, common, "en")) ++ Seq(
      (6L, "the cat sat on zebra quark", "en"),
      (7L, "zebra quark flux the cat sat", "en"),
      (8L, "flux jolt wisp nook vex yurt", "en"),
      (9L, "qoph xylem fjord glyph crwth zarf", "en"),
      (10L, "solo", "en")))  // no bigrams — must NOT vanish from the mix
      .toDF("doc_id", "text", "lang")
    val out = Curation.q132CcnetBucketsOn(docs)
      .select("doc_id", "bucket", "avg_lp_micro")
      .as[(Long, String, Option[Double])].collect()
    assert(out.length == 10, "bucketing must be total over the corpus")
    val bucket = out.map(r => r._1 -> r._2).toMap
    // ntile(3) over 10 docs = 4/3/3 in score order: the five common docs
    // tie at the top (doc_id breaks the tie), mids follow, rares + the
    // scoreless short doc rank last
    assert((1L to 4L).forall(bucket(_) == "head"), s"head: $bucket")
    assert(Seq(5L, 6L, 7L).forall(bucket(_) == "middle"), s"middle: $bucket")
    assert(Seq(8L, 9L, 10L).forall(bucket(_) == "tail"), s"tail: $bucket")
    assert(out.find(_._1 == 10L).get._3.isEmpty, "short doc has no score")
  }

  test("q182: full verbatim quote found at containment 1.0 where Jaccard dedup misses it") {
    // doc 1 = 16 tokens; doc 2 quotes ALL of doc 1 inside 64 other
    // tokens (Jaccard = 16/80 = 0.2 — far under q31's 0.5 cut); doc 3
    // unrelated
    val small = (1 to 16).map(i => s"q$i").mkString(" ")
    val filler = (1 to 64).map(i => s"f$i").mkString(" ")
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, small), (2L, s"$filler $small"), (3L, other))
      .toDF("doc_id", "text")
    val got = Curation.q182QuotePairsOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 1000000L)), s"got ${got.toSeq}")
    // the contrast: resemblance dedup does NOT surface this pair
    val jacc = PipelineQueries.q31NgramJaccardOn(
      docs.withColumn("source", lit("s")).withColumn("lang", lit("en")))
      .collect()
    assert(jacc.isEmpty, "q31 should miss the low-Jaccard quote pair")
  }

  test("q182: fingerprints above the popularity cap are boilerplate, not quotes") {
    // the same 8-token window in 20 docs (> QuoteFpCap = 16), padded
    // with per-doc unique text: no pair may be emitted from it
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = (1L to 20L).map(i =>
      (i, s"$boiler " + (1 to 16).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    assert(Curation.q182QuotePairsOn(docs).count() == 0)
  }

  test("q236: hand-computed Kneser-Ney terms, and mass sums to 1 on full vocab") {
    import spark.implicits._
    // spine: (a,b,3) (a,c,1) (b,b,2) -> cv(a)=4 n1v(a)=2, cv(b)=2
    // n1v(b)=1; n1w(b)=2 n1w(c)=1; N1+(..)=3, d=3/4
    val bi = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "b", 2L))
      .toDF("v", "w", "c")
    val got = Curation.kneserNeyOn(bi).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(6)).toMap
    assert(got(("a", "b")) == 812500L, s"$got") // 9/16 + 12/48
    assert(got(("a", "c")) == 187500L, s"$got") // 1/16 + 6/48
    assert(got(("b", "b")) == 875000L, s"$got") // 5/8 + 6/24
    // every vocab word follows 'a', so P(.|a) must carry FULL mass
    assert(got(("a", "b")) + got(("a", "c")) == 1000000L)
  }

  test("q236: continuation probability demotes the one-context word") {
    import spark.implicits._
    // 'x' follows ONLY 'san' (count 50); 'the' follows many contexts
    // with small counts. After unseen context 'q' is irrelevant here,
    // but between the two: n1w(x)=1 while n1w(the)=4 -> term2 favors
    // 'the' despite x's big raw count.
    val bi = (Seq(("san", "x", 50L)) ++
      Seq("a", "b", "c", "d").map(v => (v, "the", 2L))).toDF("v", "w", "c")
    val out = Curation.kneserNeyOn(bi).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(5))).toMap
    assert(out(("san", "x"))._2 == 1L)   // n1w(x) = 1
    assert(out(("a", "the"))._2 == 4L)   // n1w(the) = 4
  }
}
