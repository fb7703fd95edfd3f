package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Planted-fixture proofs for the model-based curation queries: the sf
  * corpora are synthetic (langs share vocabulary), so corpus accuracy
  * alone would not prove the classifier/weighting machinery works.
  * These fixtures make the right answer unambiguous. */
class ModelingSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side replica of the engine's salted md5 hash split. */
  private def pct(salt: String, id: Long, m: Int = 100): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % m
  }

  private val vocab = Map(
    "aa" -> (1 to 12).map(i => s"alpha$i"),
    "bb" -> (1 to 12).map(i => s"beta$i"),
    "cc" -> (1 to 12).map(i => s"gamma$i"))

  test("q122 NB classifies every held-out doc of disjoint-vocab classes") {
    // 20 docs per class — 16 landing in the hash-train split, 4 held out
    // (ids picked via the driver-side hash replica so no class can end
    // up train-only). Each doc is a rotation of its class vocabulary, so
    // train docs of a class cover exactly the tokens its test docs use
    // and classes share nothing — NB must score 100%
    val trainIds = (1L to 2000L).filter(pct("nb:", _) < 80)
    val testIds = (1L to 2000L).filter(pct("nb:", _) >= 80)
    val docs = (for {
      ((lang, toks), c) <- vocab.toSeq.zipWithIndex
      (id, i) <- (trainIds.slice(16 * c, 16 * c + 16) ++
        testIds.slice(4 * c, 4 * c + 4)).zipWithIndex
    } yield {
      val rot = toks.drop(i % toks.size) ++ toks.take(i % toks.size)
      (id, lang, rot.mkString(" "))
    }).toDF("doc_id", "lang", "text")
    val out = Modeling.q122NbLangidOn(docs)
      .select("lang", "predicted", "correct")
      .as[(String, String, Long)].collect()
    assert(out.nonEmpty, "hash split left no test docs")
    assert(out.forall { case (l, p, c) => l == p && c == 1L },
      s"misclassified: ${out.filter(_._3 == 0L).mkString(", ")}")
    // all three classes must actually appear in the held-out set, or the
    // 100% above could be a one-class fluke
    assert(out.map(_._1).toSet == vocab.keySet)
  }

  test("q122 held-out docs never leak into training (split is the hash)") {
    val docs = (for {
      (lang, toks) <- vocab.toSeq
      i <- 0 until 20
    } yield (lang.hashCode.abs.toLong * 1000 + i, lang, toks.mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val outIds = Modeling.q122NbLangidOn(docs)
      .select("doc_id").as[Long].collect().toSet
    val expected = docs.select("doc_id").as[Long].collect()
      .filter(id => pct("nb:", id) >= 80).toSet
    assert(outIds == expected)
  }

  test("q123 audit: planted in-stratum dup pairs are fully recalled") {
    // ids that land in the audit stratum (pct < AuditPct) vs out of it
    val inIds = (1L to 5000L).filter(pct("audit:", _) < Modeling.AuditPct)
    val outIds = (1L to 5000L).filter(pct("audit:", _) >= Modeling.AuditPct)
    // 5 identical-text dup pairs inside the stratum (J = 1.0 — banding
    // must surface them: identical token sets share every band key),
    // plus unique-text docs inside and outside it
    val dupIds = inIds.take(10)
    val dups = dupIds.zipWithIndex.map { case (id, i) =>
      (id, s"dup${i / 2} " + (1 to 11).map(j => s"pair${i / 2}tok$j").mkString(" "))
    }
    val uniques = (inIds.drop(10).take(20) ++ outIds.take(20)).map(id =>
      (id, (1 to 12).map(j => s"only${id}tok$j").mkString(" ")))
    val docs = (dups ++ uniques).toDF("doc_id", "text")
    val Array((nDocs, nTruth, nCand, nHit, prec, rec)) =
      Modeling.q123DedupAuditOn(docs)
        .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(nDocs == 30, s"stratum picked up $nDocs docs") // 10 dups + 20 in-stratum uniques
    assert(nTruth == 5, s"truth pairs: $nTruth")
    assert(nHit == 5 && rec == 1.0, s"hit=$nHit recall=$rec")
    assert(nCand >= nHit && prec > 0.0 && prec <= 1.0)
  }

  test("q125 leakage: an eval doc copying train spans scores 1, unique scores 0") {
    // ids routed through the real split hash: trains carry the shared
    // text; one eval doc copies it wholesale, one is entirely unique
    val trainIds = (1L to 2000L).filter(pct("split:", _) < 90)
    val evalIds = (1L to 2000L).filter(pct("split:", _) >= 90)
    val shared = (1 to 12).map(i => s"shared$i").mkString(" ")
    val unique = (1 to 12).map(i => s"unique$i").mkString(" ")
    val half = ((1 to 4).map(i => s"shared$i") ++
      (1 to 8).map(i => s"fresh$i")).mkString(" ")
    val docs = (trainIds.take(3).map((_, shared)) ++ Seq(
      (evalIds(0), shared),   // fully leaked
      (evalIds(1), unique),   // fully clean
      (evalIds(2), half)))    // 12 toks → 5 spans, 1 leaked (shared1..4+fresh1..4 is new)
      .toDF("doc_id", "text")
    val out = Modeling.q125SplitLeakageOn(docs)
      .select("doc_id", "n_spans", "n_leaked", "leak_ratio")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(evalIds(0)) == ((evalIds(0), 5L, 5L, 1.0)), s"${out(evalIds(0))}")
    assert(out(evalIds(1)) == ((evalIds(1), 5L, 0L, 0.0)), s"${out(evalIds(1))}")
    assert(out(evalIds(2))._3 == 0L, s"half-doc spans all cross the boundary: ${out(evalIds(2))}")
    assert(out.size == 3)
  }

  test("q127 drift: a template-flood source diverges far beyond a typical one") {
    // 'bulk' defines the corpus distribution; 'typical' mirrors it;
    // 'flood' is one token repeated — maximal drift from the mix
    val common = (1 to 20).map(i => s"c$i").mkString(" ")
    val docs = (
      (1 to 20).map(i => (i.toLong, "bulk", common)) ++
      (21 to 24).map(i => (i.toLong, "typical", common)) ++
      (25 to 28).map(i => (i.toLong, "flood", (1 to 20).map(_ => "spam").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val kl = Modeling.q127SourceDriftOn(docs)
      .select("source", "kl_micro").as[(String, Long)].collect().toMap
    assert(kl("flood") > kl("typical") + 100000,
      s"flood source not flagged: $kl")
    assert(kl("typical") < 200000, s"typical source drifted: $kl")
  }

  test("q128 cluster split: near-dup pairs never straddle the boundary; singletons keep q98's split") {
    val dir = "/root/testdata/sf0.001"
    val split = Modeling.q128ClusterSplit(spark, dir)
      .as[(Long, String)].collect().toMap
    val pairs = PipelineQueries.q31NgramJaccard(spark, dir)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "corpus fixture has no near-dup pairs — test is vacuous")
    val straddlers = pairs.filter { case (a, b) => split(a) != split(b) }
    assert(straddlers.isEmpty, s"leaking pairs: ${straddlers.take(5).mkString(", ")}")
    assert(split.values.toSet.size >= 2, "split degenerated to one side")

    // docs in no pair are their own component → q98's assignment exactly
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val q98 = ScalePipeline.q98TrainSplit(spark, dir)
      .as[(Long, String)].collect().toMap
    val singles = split.keySet.diff(paired)
    assert(singles.nonEmpty && singles.forall(id => split(id) == q98(id)))
  }

  test("q124 DSIR weights tilt toward the target stratum") {
    // target docs share one vocabulary, off-target docs another; a mixed
    // doc sits between. Per-token weight must order target > mixed > off.
    val tToks = (1 to 12).map(i => s"tgt$i")
    val oToks = (1 to 12).map(i => s"off$i")
    val docs = (
      (1 to 10).map(i => (i.toLong, "en", tToks.mkString(" "))) ++
      (11 to 20).map(i => (i.toLong, "de", oToks.mkString(" "))) ++
      Seq((21L, "de", (tToks.take(6) ++ oToks.take(6)).mkString(" "))))
      .toDF("doc_id", "lang", "text")
    val w = Modeling.q124DsirWeightsOn(docs)
      .select(col("doc_id"), (col("lw_micro") / col("n_tok")).as("pt"))
      .as[(Long, Double)].collect().toMap
    val target = (1 to 10).map(i => w(i.toLong)).head
    val off = (11 to 20).map(i => w(i.toLong)).head
    assert(target > w(21L) && w(21L) > off,
      s"per-token weights not ordered: target=$target mixed=${w(21L)} off=$off")
    // weights are identical within each identical-text group
    assert((1 to 10).map(i => w(i.toLong)).distinct.size == 1)
  }

  test("q239: hand-computed JS on half-overlapping vocabularies") {
    import spark.implicits._
    // P = {x:.5, y:.5}, Q = {y:.5, z:.5} -> JS = ln2/2 = .3466 nats.
    // Snapped per token: t1 = 2*693147 + 0, div 8 -> 173286 each side.
    val toks = (Seq("x", "x", "y", "y").map((true, _)) ++
      Seq("y", "y", "z", "z").map((false, _))).toDF("a", "tok")
    val got = Modeling.jsDivergenceOn(toks, "a", "b").collect().head
    assert(got.getLong(2) == 4L && got.getLong(3) == 4L)
    assert(got.getLong(4) == 346572L, s"$got")
  }

  test("q239: identical distributions give exactly zero; disjoint give ln 2") {
    import spark.implicits._
    val same = (Seq("u", "v").map((true, _)) ++ Seq("u", "v").map((false, _)))
      .toDF("a", "tok")
    assert(Modeling.jsDivergenceOn(same, "a", "b").collect().head
      .getLong(4) == 0L)
    val disj = (Seq("u", "u").map((true, _)) ++ Seq("w", "w").map((false, _)))
      .toDF("a", "tok")
    // each token contributes ln 2 -> js = ln 2 = 693147 less truncation
    val js = Modeling.jsDivergenceOn(disj, "a", "b").collect().head.getLong(4)
    assert(js == 693146L || js == 693147L, s"js=$js")
  }
}
