package graft.streaming

import java.nio.file.Files

import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class CrawlDoc(doc_id: Long, text: String)

class DedupIngestSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def corpus(): Seq[CrawlDoc] = {
    val rnd = new scala.util.Random(13L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def doc(): String = Seq.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 40L).map(i => CrawlDoc(i, doc()))
    // near-dups of earlier docs, landing in later batches
    val mutated = (40L until 60L).map { i =>
      val src = base(rnd.nextInt(base.size)).text.split(" ")
      CrawlDoc(i, (src.init :+ vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    base ++ mutated
  }

  test("streamed batch ingest converges to the monolithic survivor set") {
    val all = corpus()
    val dir = Files.createTempDirectory("dedup_ingest").toString
    val input = MemoryStream[CrawlDoc](spark)
    val q = DedupIngest.start(input.toDF(), "doc_id", "text",
      s"$dir/index", s"$dir/survivors", s"$dir/ckpt")
    try {
      // batch ids ascend with arrival order — the incremental rule's
      // existing-always-wins then matches the monolithic min-id rule
      input.addData(all.filter(_.doc_id < 25))
      q.processAllAvailable()
      input.addData(all.filter(d => d.doc_id >= 25 && d.doc_id < 45))
      q.processAllAvailable()
      input.addData(all.filter(_.doc_id >= 45))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$dir/survivors")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val oneShot = Dedup.minhashLshKeep(all.toDF(), "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == oneShot)

    // the on-disk index holds every RAW batch row (not survivors only)
    val indexed = spark.read.parquet(s"$dir/index")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(indexed == all.map(_.doc_id).sorted)
  }

  test("epoch compaction folds committed index partitions without changing decisions") {
    val all = corpus()
    val dir = Files.createTempDirectory("dedup_ingest_compact").toString
    val input = MemoryStream[CrawlDoc](spark)
    val q = DedupIngest.start(input.toDF(), "doc_id", "text",
      s"$dir/index", s"$dir/survivors", s"$dir/ckpt", compactEvery = 2)
    try {
      for (chunk <- all.grouped(15)) { // 4 epochs -> compactions at 2 (and none after)
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/survivors")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val oneShot = Dedup.minhashLshKeep(all.toDF(), "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == oneShot, "compaction changed admission decisions")
    // the index still holds every raw row, in fewer partitions
    val idx = spark.read.parquet(s"$dir/index")
    assert(idx.select("doc_id").as[Long].collect().sorted.toSeq ==
      all.map(_.doc_id).sorted)
    val dirs = new java.io.File(s"$dir/index").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__batch=")).map(_.getName)
    // epochs 0,1 folded into __batch=-2; epochs 2,3 remain
    assert(dirs.toSet == Set("__batch=-2", "__batch=2", "__batch=3"), dirs.toSeq)
  }

  test("compaction is idempotent and tolerates leftover duplicates") {
    val dir = Files.createTempDirectory("epochstore").toString
    Seq((1L, "a")).toDF("doc_id", "v").write.parquet(s"$dir/__batch=0")
    Seq((2L, "b")).toDF("doc_id", "v").write.parquet(s"$dir/__batch=1")
    EpochStore.compact(spark, dir, cutoff = 2)
    EpochStore.compact(spark, dir, cutoff = 2) // replayed compaction: no-op/rewrite
    val rows = spark.read.parquet(dir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 2L))
    // simulate a crash between rename and delete: a folded epoch resurfaces
    Seq((2L, "b")).toDF("doc_id", "v").write.parquet(s"$dir/__batch=1")
    val dup = spark.read.parquet(dir).select("doc_id").as[Long].collect().sorted.toSeq
    assert(dup == Seq(1L, 2L, 2L), "precondition: duplicate visible")
    EpochStore.compact(spark, dir, cutoff = 3) // next pass cleans it up...
    val cleaned = spark.read.parquet(dir).select("doc_id", "v").distinct()
      .as[(Long, String)].collect().sorted.toSeq
    assert(cleaned == Seq((1L, "a"), (2L, "b")))
  }

  test("a replayed epoch overwrites its own output (at-least-once safe)") {
    val docs = corpus().take(20)
    val dir = Files.createTempDirectory("dedup_ingest_replay").toString
    // run the same first batch through TWO streams sharing output paths
    // but not a checkpoint — the second run replays epoch 0 exactly
    for (run <- 1 to 2) {
      val input = MemoryStream[CrawlDoc](spark)
      val q = DedupIngest.start(input.toDF(), "doc_id", "text",
        s"$dir/index", s"$dir/survivors", s"$dir/ckpt$run")
      try { input.addData(docs); q.processAllAvailable() } finally q.stop()
    }
    val survivors = spark.read.parquet(s"$dir/survivors")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val expect = Dedup.minhashLshKeep(docs.toDF(), "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == expect, "replay must not duplicate rows")
  }

  test("schema-drifted persisted index fails LOUDLY, not silent degrade") {
    // Plant an index epoch whose schema lacks the __toks column the
    // probe consumes. The old broad `catch AnalysisException → first
    // batch` silently degraded incremental dedup to within-batch-only
    // on exactly this; the ingest must surface the error instead.
    val dir = Files.createTempDirectory("dedup_drift").toString
    Seq((1L, "stale")).toDF("doc_id", "not_toks")
      .write.parquet(s"$dir/index/__batch=99")
    val input = MemoryStream[CrawlDoc](spark)
    val q = DedupIngest.start(input.toDF(), "doc_id", "text",
      s"$dir/index", s"$dir/survivors", s"$dir/ckpt")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try { input.addData(corpus().take(10)); q.processAllAvailable() }
      finally q.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(_.isInstanceOf[org.apache.spark.sql.AnalysisException]),
      s"expected a propagated AnalysisException, got: $err")
    assert(!new java.io.File(s"$dir/survivors/__batch=0").exists ||
      spark.read.parquet(s"$dir/survivors").isEmpty)
  }

  test("existing-but-footerless index reads as empty, not as a query kill") {
    // a lister catching the store dir created but with no committed
    // footers must behave as the nothing-committed-yet truth
    val dir = Files.createTempDirectory("dedup_footerless").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/index"))
    val docs = corpus().take(20)
    val input = MemoryStream[CrawlDoc](spark)
    val q = DedupIngest.start(input.toDF(), "doc_id", "text",
      s"$dir/index", s"$dir/survivors", s"$dir/ckpt")
    try { input.addData(docs); q.processAllAvailable() } finally q.stop()
    val got = spark.read.parquet(s"$dir/survivors").select("doc_id")
      .as[Long].collect().toSet
    val expected = Dedup.minhashLshKeep(docs.toDF(), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected, "empty store must behave as first batch")
  }
}
