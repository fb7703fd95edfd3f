package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class LmRouterSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val common = "the cat sat on the mat"

  test("frozen-model scoring: on-corpus beats unseen; short junk still scores") {
    val dir = Files.createTempDirectory("lm_router").toString
    val ref = (1L to 30L).map(i => (i, common)).toDF("doc_id", "text")
    LmRouter.train(ref, "text", s"$dir/model")
    val m = LmRouter.load(spark, s"$dir/model")

    val probe = Seq(
      (1L, common),                            // every bigram seen 30x
      (2L, "zebra quark flux jolt wisp nook"), // every bigram unseen
      (3L, "hi")                               // no bigrams at all
    ).toDF("doc_id", "text")
    val s = LmRouter.score(probe, "doc_id", "text", m)
      .select("doc_id", "n_bigrams", "avg_lp_micro")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(s(1L)._3 > s(2L)._3, s"on-corpus ${s(1L)} must beat unseen ${s(2L)}")
    // an all-unseen doc and a no-bigram doc both back off to ln(1/V)
    assert(s(3L)._2 == 1L && s(3L)._3 == s(2L)._3, s"${s(3L)} vs ${s(2L)}")
  }

  test("stream lanes match the batch scorer, and scores do not drift with volume") {
    val dir = Files.createTempDirectory("lm_router_stream").toString
    LmRouter.train((1L to 30L).map(i => (i, common)).toDF("doc_id", "text"),
      "text", s"$dir/model")
    val m = LmRouter.load(spark, s"$dir/model")

    // cuts from the frozen reference distribution: head = the on-corpus
    // score itself, tail = strictly below the half-seen mid score
    val cutProbe = Seq((1L, common), (2L, "the cat sat on zebra quark"))
      .toDF("doc_id", "text")
    val cuts = LmRouter.score(cutProbe, "doc_id", "text", m)
      .select("doc_id", "avg_lp_micro").as[(Long, Double)].collect().toMap
    val (headCut, tailCut) = (cuts(1L), cuts(2L))

    val docs = Seq(
      CrawlDoc(10L, common),                            // head
      CrawlDoc(11L, "the cat sat on zebra quark"),      // middle (= tailCut, not below)
      CrawlDoc(12L, "zebra quark flux jolt wisp nook"), // tail
      CrawlDoc(13L, common))                            // head, batch 2
    val input = MemoryStream[CrawlDoc](spark)
    val q = LmRouter.start(input.toDF(), "doc_id", "text", s"$dir/model",
      s"$dir/routed", s"$dir/ckpt", headCut, tailCut)
    try {
      input.addData(docs.take(3))
      q.processAllAvailable()
      input.addData(docs.drop(3))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.read.parquet(s"$dir/routed")
      .select("doc_id", "lane", "avg_lp_micro")
      .as[(Long, String, Double)].collect()
    // length BEFORE the keyed map: a replayed epoch that appended
    // duplicates would survive a map-size check
    assert(rows.length == 4, s"docs lost or duplicated: ${rows.toSeq}")
    val routed = rows.map(r => r._1 -> r).toMap
    assert(routed(10L)._2 == "head" && routed(13L)._2 == "head")
    assert(routed(11L)._2 == "middle", s"half-seen doc: ${routed(11L)}")
    assert(routed(12L)._2 == "tail")
    // FROZEN means frozen: identical text scores identically in later
    // epochs no matter what arrived in between
    assert(routed(10L)._3 == routed(13L)._3)
    // and the streamed scores are exactly the batch scorer's
    val batch = LmRouter.score(
        docs.toDF().select(col("doc_id"), col("text")), "doc_id", "text", m)
      .select("doc_id", "avg_lp_micro").as[(Long, Double)].collect().toMap
    docs.foreach(d => assert(routed(d.doc_id)._3 == batch(d.doc_id),
      s"doc ${d.doc_id}: stream ${routed(d.doc_id)._3} vs batch ${batch(d.doc_id)}"))
  }
}
