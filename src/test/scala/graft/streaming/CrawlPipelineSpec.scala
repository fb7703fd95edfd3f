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
        CrawlDoc(4L, s"$clean2 extra"),          // dedup: near-dup of 3
        CrawlDoc(5L, clean3)))
      h.processAllAvailable()
    } finally h.stopAll()

    // gate decisions: 2 rejected, rest accepted
    val reasons = spark.read.parquet(s"$dir/decisions")
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(reasons(2L) == "too_short")
    assert(Seq(1L, 3L, 5L).forall(reasons(_) == "ok"))

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
    // if clean2+extra stopped verifying >= 0.5 Jaccard against clean2,
    // the pipeline test above would pass vacuously with 4 admitted
    val toks2 = clean2.split(" ").toSet
    val toks4 = s"$clean2 extra".split(" ").toSet
    val j = toks2.intersect(toks4).size.toDouble / toks2.union(toks4).size
    assert(j >= 0.5, s"fixture jaccard $j")
  }
}
