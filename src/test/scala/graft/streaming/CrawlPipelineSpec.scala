package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class CrawlPipelineSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val clean1 =
    "one two three four five six seven eight nine ten eleven twelve"
  private val clean2 =
    "red orange yellow green blue indigo violet umber ochre teal navy plum"
  private val clean3 =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  // identical token SET as clean2 (Jaccard 1.0 — the dedup stage must
  // drop it) but reversed ORDER, so none of its 8-token spans match
  // clean2's and the gate's span-dup rule does NOT intercept it first
  private val clean2Permuted = clean2.split(" ").reverse.mkString(" ")

  test("crawl stream flows gate → dedup → shards; each stage drops its own") {
    val dir = Files.createTempDirectory("crawl_pipeline").toString
    val input = MemoryStream[CrawlDoc](spark)
    val h = CrawlPipeline.start(input.toDF(), dir)
    try {
      input.addData(Seq(
        CrawlDoc(1L, clean1),
        CrawlDoc(2L, "too short"),               // gate: too_short
        CrawlDoc(3L, clean2)))
      h.processAllAvailable()
      input.addData(Seq(
        CrawlDoc(4L, clean2Permuted),            // dedup: near-dup of 3
        CrawlDoc(5L, clean3)))
      h.processAllAvailable()
    } finally h.stopAll()

    // gate decisions: 2 rejected; 4 must be ACCEPTED here (the gate's
    // span rule must not be the thing that kills it, or the dedup-stage
    // assertion below is vacuous)
    val reasons = spark.read.parquet(s"$dir/decisions")
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(reasons(2L) == "too_short")
    assert(Seq(1L, 3L, 4L, 5L).forall(reasons(_) == "ok"),
      s"gate intercepted the dedup fixture: $reasons")

    // dedup survivors: 4 dropped as a near-dup of 3 (cross-batch)
    val survivors = spark.read.parquet(s"$dir/survivors")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L, 5L), s"survivors: $survivors")

    // shards hold exactly the survivors, with a consistent manifest
    val sharded = spark.read.parquet(s"$dir/shards")
    assert(sharded.select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 5L))
    val manifestDocs = spark.read.parquet(s"$dir/manifest")
      .agg(sum("n_docs")).as[Long].head()
    assert(manifestDocs == 3L)
  }

  test("doc 4 really is a near-dup the dedup stage must catch (fixture guard)") {
    // if the permutation stopped verifying >= 0.5 Jaccard against
    // clean2, the pipeline test above would pass vacuously with 4
    // admitted; if it regained shared spans, the GATE would kill it
    // before the dedup stage sees it
    val toks2 = clean2.split(" ").toSet
    val toks4 = clean2Permuted.split(" ").toSet
    val j = toks2.intersect(toks4).size.toDouble / toks2.union(toks4).size
    assert(j >= 0.5, s"fixture jaccard $j")
    val spans2 = clean2.split(" ").sliding(8).map(_.mkString(" ")).toSet
    val spans4 = clean2Permuted.split(" ").sliding(8).map(_.mkString(" ")).toSet
    assert(spans2.intersect(spans4).isEmpty,
      "permutation shares spans with the original — the gate would intercept it")
  }

  test("an upstream epoch replay does not duplicate shards or manifest counts") {
    val dir = Files.createTempDirectory("crawl_replay").toString
    val input = MemoryStream[CrawlDoc](spark)
    val h = CrawlPipeline.start(input.toDF(), dir)
    try {
      input.addData(Seq(CrawlDoc(1L, clean1), CrawlDoc(3L, clean2)))
      h.processAllAvailable()
      // simulate a dedup-stage crash-replay: its epoch partition is
      // rewritten with identical rows under NEW part-file names, which
      // the downstream file source re-emits (rows pinned locally first —
      // a lazy self-overwrite would read the files it is deleting)
      val epoch = spark.read.parquet(s"$dir/survivors/__batch=0").collect()
      val schema = spark.read.parquet(s"$dir/survivors/__batch=0").schema
      spark.createDataFrame(java.util.Arrays.asList(epoch: _*), schema)
        .write.mode("overwrite").parquet(s"$dir/survivors/__batch=0")
      input.addData(Seq(CrawlDoc(5L, clean3)))
      h.processAllAvailable()
    } finally h.stopAll()

    val sharded = spark.read.parquet(s"$dir/shards")
      .groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(sharded.keySet == Set(1L, 3L, 5L), s"sharded: $sharded")
    assert(sharded.values.forall(_ == 1L),
      s"replayed epoch duplicated shard rows: $sharded")
    val manifestDocs = spark.read.parquet(s"$dir/manifest")
      .agg(sum("n_docs")).as[Long].head()
    assert(manifestDocs == 3L, s"manifest double-counted: $manifestDocs")
  }

  test("with a frozen LM model, only trainer lanes reach the shards") {
    val dir = Files.createTempDirectory("crawl_routed").toString
    // reference model: the clean vocabulary is what "good" looks like
    LmRouter.train(
      Seq(clean1, clean2, clean3).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "text", s"$dir/model")
    val m = LmRouter.load(spark, s"$dir/model")
    // junk passes every GATE rule (≥5 distinct tokens, no PII, unique
    // spans) — only the LM lane can catch it
    val junk = "qof xylem fjord glyph crwth zarf vex nook wisp jolt"
    val cuts = LmRouter.score(
        Seq((1L, clean1), (2L, junk)).toDF("doc_id", "text"),
        "doc_id", "text", m)
      .select("doc_id", "avg_lp_micro").as[(Long, Double)].collect().toMap
    val (headCut, tailCut) = (cuts(1L), (cuts(1L) + cuts(2L)) / 2)

    val input = MemoryStream[CrawlDoc](spark)
    val h = CrawlPipeline.start(input.toDF(), dir,
      lmModel = Some((s"$dir/model", headCut, tailCut)))
    try {
      input.addData(Seq(
        CrawlDoc(10L, clean1),      // head → sharded
        CrawlDoc(11L, junk),        // tail → routed store only
        CrawlDoc(12L, "too short"))) // gate reject → nowhere downstream
      h.processAllAvailable()
      // dedup-stage crash-replay: the survivors epoch is rewritten with
      // identical rows under NEW file names — the routed store must not
      // double its docs (the survivors→router hop has its own id guard)
      val epoch = spark.read.parquet(s"$dir/survivors/__batch=0").collect()
      val schema = spark.read.parquet(s"$dir/survivors/__batch=0").schema
      spark.createDataFrame(java.util.Arrays.asList(epoch: _*), schema)
        .write.mode("overwrite").parquet(s"$dir/survivors/__batch=0")
      input.addData(Seq(CrawlDoc(13L, clean3))) // head, later epoch
      h.processAllAvailable()
    } finally h.stopAll()

    val lanes = spark.read.parquet(s"$dir/routed")
      .select("doc_id", "lane").as[(Long, String)].collect()
    assert(lanes.length == 3, s"replay duplicated routed docs: ${lanes.toSeq}")
    assert(lanes.toMap == Map(10L -> "head", 11L -> "tail", 13L -> "head"),
      s"lanes: ${lanes.toSeq}")
    val sharded = spark.read.parquet(s"$dir/shards")
      .select("doc_id").as[Long].collect().toSet
    assert(sharded == Set(10L, 13L),
      s"tail/rejected docs leaked into the trainer shards: $sharded")
  }
}
