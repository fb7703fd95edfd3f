package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class PrunedDedupIngestSpec extends graft.SparkTestBase {
  import spark.implicits._

  // near-dup pairs across batches: doc i and doc i+100 share most tokens
  private def doc(i: Int, salt: String = ""): CrawlDoc =
    CrawlDoc(i.toLong,
      ((1 to 12).map(j => s"t${(i % 10) * 13 + j}") :+ s"x$i$salt").mkString(" "))

  private val b1 = (0 until 30).map(doc(_))
  private val b2 = (100 until 130).map(i => doc(i - 100).copy(doc_id = i.toLong))
  private val b3 = (200 until 220).map(i => CrawlDoc(i.toLong,
    (1 to 13).map(j => s"u${i * 17 + j}").mkString(" ")))

  private def runIngest(pruned: Boolean, dir: String): Set[Long] = {
    val input = MemoryStream[CrawlDoc](spark)
    val q =
      if (pruned) PrunedDedupIngest.start(input.toDF(), "doc_id", "text",
        s"$dir/store", s"$dir/survivors", s"$dir/ckpt")
      else DedupIngest.start(input.toDF(), "doc_id", "text",
        s"$dir/index", s"$dir/survivors", s"$dir/ckpt")
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(b3); q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(s"$dir/survivors").select("doc_id")
      .as[Long].collect().toSet
  }

  test("pruned-store stream admits exactly what the full-scan ingest admits") {
    val a = runIngest(pruned = false, Files.createTempDirectory("full_ingest").toString)
    val b = runIngest(pruned = true, Files.createTempDirectory("pruned_ingest").toString)
    assert(b == a, s"diverged: ${b.diff(a)} / ${a.diff(b)}")
    // the fixture must actually exercise cross-batch dedup
    assert(a.size < b1.size + b2.size + b3.size, "no cross-batch drops — weak fixture")
    // lane layout is the prunable one
    assert(a.nonEmpty)
  }

  test("schema-drifted persisted store fails LOUDLY, not silent degrade") {
    // Plant a store whose toks epoch has a corrupt schema (missing the
    // __toks column the probe selects). The old broad
    // `catch AnalysisException → within-batch dedup` would have silently
    // swallowed exactly this; the ingest must now surface the error.
    val dir = Files.createTempDirectory("pruned_drift").toString
    Seq((1L, "stale")).toDF("doc_id", "not_toks")
      .write.parquet(s"$dir/store/toks/__batch=99")
    Seq((1L, "b", 0, 0)).toDF("doc_id", "__bucket", "__band", "__pfx")
      .write.parquet(s"$dir/store/lanes/__batch=99/__band=0/__pfx=0")
    val input = MemoryStream[CrawlDoc](spark)
    val q = PrunedDedupIngest.start(input.toDF(), "doc_id", "text",
      s"$dir/store", s"$dir/survivors", s"$dir/ckpt")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try { input.addData(b1); q.processAllAvailable() } finally q.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(_.isInstanceOf[org.apache.spark.sql.AnalysisException]),
      s"expected a propagated AnalysisException, got: $err")
    // and nothing was admitted as if the store were healthy
    assert(!new java.io.File(s"$dir/survivors/__batch=0").exists ||
      spark.read.parquet(s"$dir/survivors").isEmpty)
  }

  test("existing-but-footerless store reads as empty, not as a query kill") {
    // the under-load flake: a lister catches the store dir created but
    // with no committed footers. The declared-schema read must treat it
    // as the nothing-committed-yet truth (the drift gate skips — there
    // is nothing to mis-read), NOT die with UNABLE_TO_INFER_SCHEMA.
    val dir = Files.createTempDirectory("pruned_footerless").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/store/toks"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/store/lanes"))
    val input = MemoryStream[CrawlDoc](spark)
    val q = PrunedDedupIngest.start(input.toDF(), "doc_id", "text",
      s"$dir/store", s"$dir/survivors", s"$dir/ckpt")
    try { input.addData(b1); q.processAllAvailable() } finally q.stop()
    val got = spark.read.parquet(s"$dir/survivors").select("doc_id")
      .as[Long].collect().toSet
    val expected = graft.operators.Dedup
      .minhashLshKeep(b1.toDF(), "doc_id", "text", 8, 3, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got === expected, "empty store must behave as first batch")
  }

  test("replayed epoch decides identically; lane store keeps the prunable layout") {
    val dir = Files.createTempDirectory("pruned_replay").toString
    for (run <- 1 to 2) { // same epoch twice = crash-replay
      val input = MemoryStream[CrawlDoc](spark)
      val q = PrunedDedupIngest.start(input.toDF(), "doc_id", "text",
        s"$dir/store", s"$dir/survivors", s"$dir/ckpt$run")
      try { input.addData(b1); q.processAllAvailable() } finally q.stop()
    }
    val survivors = spark.read.parquet(s"$dir/survivors")
    assert(survivors.select("doc_id").distinct().count() == survivors.count(),
      "replay duplicated survivors")
    // nested partition dirs present: __batch=0/__band=*/__pfx=*
    val epoch0 = new java.io.File(s"$dir/store/lanes/__batch=0")
    assert(epoch0.exists)
    val bandDirs = epoch0.listFiles().filter(_.getName.startsWith("__band="))
    assert(bandDirs.nonEmpty &&
      bandDirs.head.listFiles().exists(_.getName.startsWith("__pfx=")))
  }
}
