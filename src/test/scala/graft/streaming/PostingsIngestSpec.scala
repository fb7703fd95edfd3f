package graft.streaming

import java.nio.file.Files

import graft.queries.Analytics
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class PostDoc(doc_id: Long, text: String)

class PostingsIngestSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("epoch-landed postings answer the phrase probe identically to batch; compaction keeps it") {
    val root = Files.createTempDirectory("postings_ingest").toString
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").as[PostDoc].collect().toSeq
    val input = MemoryStream[PostDoc](spark)
    val q = PostingsIngest.start(input.toDF(), s"$root/postings",
      s"$root/ckpt", compactEvery = 2)
    try {
      for (b <- docs.grouped(math.max(1, docs.length / 4)).toSeq) {
        input.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = PostingsIngest.phrase(spark, s"$root/postings",
        Analytics.PhraseFirst, Analytics.PhraseSecond)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val batch = Analytics.q143PhraseSearchOn(
        Tables.documents(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(streamed == batch,
      "streamed postings store diverged from the batch phrase query")
  }
}
