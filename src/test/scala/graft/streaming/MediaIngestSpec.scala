package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class MediaIngestSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def docs(ids: Range) =
    ids.map(i => CrawlDoc(i.toLong, s"media payload text $i with bytes")).toSeq

  test("stream landing equals the batch resize+featurize over the union") {
    val dir = Files.createTempDirectory("media_ingest").toString
    val input = MemoryStream[CrawlDoc](spark)
    val q = MediaIngest.start(input.toDF(), s"$dir/media",
      s"$dir/features", s"$dir/ckpt")
    try {
      input.addData(docs(0 until 20)); q.processAllAvailable()
      input.addData(docs(20 until 50)); q.processAllAvailable()
    } finally q.stop()

    // every doc landed exactly once, typed by modality
    val landed = spark.read.parquet(s"$dir/media")
    assert(landed.count() == 50)
    assert(landed.select("media_type").distinct().as[String].collect().toSet ==
      Set("image/bmp", "audio/wav"))

    // images are the normalized 16x16 thumbnails: constant byte size,
    // bit-identical to the batch resize of the same doc
    val batchMedia = graft.operators.Multimodal.resizeImages(
      graft.operators.Multimodal.attachBinary(
        docs(0 until 50).toDF("doc_id", "text")), 16, 16)
    val streamImgs = landed.where(col("media_type") === "image/bmp")
      .select("doc_id", "payload").as[(Long, Array[Byte])]
      .collect().map { case (id, p) => id -> p.toSeq }.toMap
    val batchImgs = batchMedia.filter(_.media_type == "image/bmp")
      .collect().map(r => r.doc_id -> r.payload.toSeq).toMap
    assert(streamImgs == batchImgs,
      "streamed thumbnails diverged from the batch resize")

    // features landed for every doc and match the batch featurize
    val streamFeat = spark.read.parquet(s"$dir/features")
      .select("doc_id", "features").as[(Long, Seq[Float])]
      .collect().toMap
    val batchFeat = graft.operators.Multimodal.extractFeatures(batchMedia)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(streamFeat == batchFeat)
  }

  test("replayed epoch overwrites itself; compaction keeps media_type dirs") {
    val dir = Files.createTempDirectory("media_replay").toString
    for (run <- 1 to 2) { // same epoch twice = crash-replay
      val input = MemoryStream[CrawlDoc](spark)
      val q = MediaIngest.start(input.toDF(), s"$dir/media",
        s"$dir/features", s"$dir/ckpt$run")
      try { input.addData(docs(0 until 12)); q.processAllAvailable() } finally q.stop()
    }
    assert(spark.read.parquet(s"$dir/media").count() == 12,
      "replay must overwrite its epoch, not append")

    val cdir = Files.createTempDirectory("media_compact").toString
    val input = MemoryStream[CrawlDoc](spark)
    val q = MediaIngest.start(input.toDF(), s"$cdir/media",
      s"$cdir/features", s"$cdir/ckpt", compactEvery = 2)
    try {
      input.addData(docs(0 until 10)); q.processAllAvailable()
      input.addData(docs(10 until 20)); q.processAllAvailable()
      input.addData(docs(20 until 30)); q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(s"$cdir/media").count() == 30)
    val root = new java.io.File(s"$cdir/media")
    val compacted = root.listFiles().filter(_.getName.startsWith("__batch=-"))
    assert(compacted.nonEmpty, "no compacted partition")
    assert(compacted.head.listFiles().exists(_.getName.startsWith("media_type=")),
      "compaction flattened the media_type subdirectories")
  }
}
