package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ShardedIngestSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def docsFor(ids: Range) =
    ids.map(i => CrawlDoc(i.toLong, (s"tok$i " * (i % 7 + 1)).trim)).toSeq

  test("stream landing equals the batch writeShards assignment over the union") {
    val dir = Files.createTempDirectory("sharded_ingest").toString
    val input = MemoryStream[CrawlDoc](spark)
    val q = ShardedIngest.start(input.toDF(), s"$dir/shards",
      s"$dir/manifest", s"$dir/ckpt")
    try {
      input.addData(docsFor(0 until 40))
      q.processAllAvailable()
      input.addData(docsFor(40 until 90))
      q.processAllAvailable()
    } finally q.stop()

    val landed = spark.read.parquet(s"$dir/shards")
    assert(landed.count() == 90, "no docs lost or duplicated")
    // shard assignment is a pure hash of doc_id: identical to what the
    // batch writer computes over the same corpus
    val batchDir = Files.createTempDirectory("batch_shards").toString
    graft.queries.ScalePipeline.writeShards(
      docsFor(0 until 90).toDF("doc_id", "text"), batchDir)
    val a = landed.select("doc_id", "shard").as[(Long, String)].collect().toSet
    val b = spark.read.parquet(batchDir)
      .select("doc_id", "shard").as[(Long, String)].collect().toSet
    assert(a == b, "stream shard assignment diverged from the batch writer")

    // manifest increments sum to the per-shard truth (via the SUM-safe reader)
    val manifest = ShardedIngest.readManifest(spark, s"$dir/manifest")
      .groupBy("shard").agg(sum("n_docs").as("n"), sum("n_tokens").as("t"))
      .as[(String, Long, Long)].collect()
      .map { case (s, n, t) => s -> ((n, t)) }.toMap
    val truth = landed
      .groupBy("shard").agg(count(lit(1)).as("n"),
        sum(size(split(col("text"), " "))).as("t"))
      .as[(String, Long, Long)].collect()
      .map { case (s, n, t) => s -> ((n, t)) }.toMap
    assert(manifest == truth)
  }

  test("replayed epoch overwrites itself instead of appending") {
    val dir = Files.createTempDirectory("sharded_replay").toString
    val docs = docsFor(0 until 30)
    for (run <- 1 to 2) { // same epoch twice = crash-replay
      val input = MemoryStream[CrawlDoc](spark)
      val q = ShardedIngest.start(input.toDF(), s"$dir/shards",
        s"$dir/manifest", s"$dir/ckpt$run")
      try { input.addData(docs); q.processAllAvailable() } finally q.stop()
    }
    assert(spark.read.parquet(s"$dir/shards").count() == 30,
      "replay must overwrite its epoch, not append")
  }

  test("manifest read is SUM-safe inside the compaction crash window") {
    // Simulate EpochStore.compact crashed after the rename commit point:
    // epochs 0,1 are folded into __batch=-2 but epoch 1's dir was not yet
    // deleted — its rows exist twice. A naive SUM double-counts; the
    // src_batch dedup in readManifest must not.
    val dir = Files.createTempDirectory("manifest_crash").toString
    def inc(batch: Long, rows: Seq[(String, Long, Long)]) =
      rows.toDF("shard", "n_docs", "n_tokens")
        .withColumn("src_batch", lit(batch))
        .write.parquet(s"$dir/manifest/__batch=$batch")
    inc(0L, Seq(("a", 5L, 50L), ("b", 3L, 30L)))
    inc(1L, Seq(("a", 2L, 20L)))
    // the compacted partition holds everything below the cutoff…
    spark.read.parquet(s"$dir/manifest").drop("__batch")
      .write.parquet(s"$dir/manifest/__batch=-2")
    // …and the crash left epoch 1 behind (delete only epoch 0)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); () }
    rm(new java.io.File(s"$dir/manifest/__batch=0"))

    val naive = spark.read.parquet(s"$dir/manifest")
      .agg(sum("n_docs")).as[Long].collect().head
    assert(naive == 12L, "fixture must actually exhibit the double-count")
    val safe = ShardedIngest.readManifest(spark, s"$dir/manifest")
      .groupBy("shard").agg(sum("n_docs").as("n"), sum("n_tokens").as("t"))
      .as[(String, Long, Long)].collect()
      .map { case (s, n, t) => s -> ((n, t)) }.toMap
    assert(safe == Map("a" -> ((7L, 70L)), "b" -> ((3L, 30L))),
      s"SUM-safe reader returned $safe")
  }

  test("compaction folds committed epochs and preserves shard subdirs") {
    val dir = Files.createTempDirectory("sharded_compact").toString
    val input = MemoryStream[CrawlDoc](spark)
    val q = ShardedIngest.start(input.toDF(), s"$dir/shards",
      s"$dir/manifest", s"$dir/ckpt", compactEvery = 2)
    try {
      input.addData(docsFor(0 until 20)); q.processAllAvailable()
      input.addData(docsFor(20 until 40)); q.processAllAvailable()
      input.addData(docsFor(40 until 60)); q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(s"$dir/shards")
    assert(landed.count() == 60, s"got ${landed.count()}")
    // content survives the fold under the same shard assignment
    assert(landed.select("doc_id").as[Long].collect().toSet == (0L until 60L).toSet)
    val root = new java.io.File(s"$dir/shards")
    val batchDirs = root.listFiles().filter(_.getName.startsWith("__batch="))
    assert(batchDirs.exists(_.getName.startsWith("__batch=-")),
      s"no compacted partition in ${batchDirs.map(_.getName).toSeq}")
    val compacted = batchDirs.filter(_.getName.startsWith("__batch=-")).head
    assert(compacted.listFiles().exists(_.getName.startsWith("shard=")),
      "compaction flattened the shard subdirectories")
  }
}
