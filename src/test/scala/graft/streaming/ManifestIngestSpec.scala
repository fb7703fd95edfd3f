package graft.streaming

import java.nio.file.Files

import graft.queries.ScalePipeline
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class ManifestDoc(doc_id: Long, text: String)

class ManifestIngestSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def manifestRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(_._1).toSeq

  test("streamed manifest equals the batch q138 over the same docs; replay cannot change it") {
    val root = Files.createTempDirectory("manifest_ingest").toString
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").as[ManifestDoc].collect().toSeq
    val (first, rest) = docs.splitAt(docs.length / 3)
    val (second, third) = rest.splitAt(rest.length / 2)

    val input = MemoryStream[ManifestDoc](spark)
    val q = ManifestIngest.start(input.toDF(), s"$root/leaves", s"$root/ckpt")
    try {
      // epoch replays: batch 2 re-ships batch 1's docs on top of its own
      for (b <- Seq(first, second, second ++ first.take(5), third)) {
        input.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = manifestRows(ManifestIngest.manifest(spark, s"$root/leaves"))
    val batch = manifestRows(ScalePipeline.q138MerkleManifest(spark, dir))
    assert(streamed == batch, "stream-folded manifest diverged from batch q138")
  }

  test("manifest before the first epoch is empty with the full schema") {
    val empty = ManifestIngest.manifest(spark, "/nonexistent/manifest/leaves")
    assert(empty.columns.toSeq ==
      Seq("shard", "n_docs", "shard_hash", "root_hash"))
    assert(empty.count() == 0)
  }

  test("compaction preserves every hash") {
    val root = Files.createTempDirectory("manifest_compact").toString
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").as[ManifestDoc].collect().toSeq
    val input = MemoryStream[ManifestDoc](spark)
    // compact every 2nd epoch so the fold path runs mid-stream
    val q = ManifestIngest.start(input.toDF(), s"$root/leaves", s"$root/ckpt",
      compactEvery = 2)
    try {
      for (b <- docs.grouped(math.max(1, docs.length / 4)).toSeq) {
        input.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = manifestRows(ManifestIngest.manifest(spark, s"$root/leaves"))
    val batch = manifestRows(ScalePipeline.q138MerkleManifest(spark, dir))
    assert(streamed == batch, "compacted leaf store changed the manifest")
  }
}
