package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class CurationGateSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val clean1 =
    "one two three four five six seven eight nine ten eleven twelve"
  private val clean2 =
    "red orange yellow green blue indigo violet umber ochre teal navy plum"

  test("gate rejects by first failing rule; cross-batch span dup sticks") {
    val dir = Files.createTempDirectory("curation_gate").toString
    val input = MemoryStream[CrawlDoc](spark)
    val q = CurationGate.start(input.toDF(), "doc_id", "text",
      s"$dir/spans", s"$dir/decisions", s"$dir/ckpt")
    try {
      input.addData(Seq(
        CrawlDoc(1L, clean1),
        CrawlDoc(2L, "too short"),
        CrawlDoc(3L, "write to jane.doe@example.org for the full document text today"),
        CrawlDoc(4L, Seq.fill(15)("buy now limited offer").mkString(" "))))
      q.processAllAvailable()
      input.addData(Seq(
        // shares >50% of its 8-token spans with accepted doc 1
        CrawlDoc(5L, s"$clean1 thirteen"),
        CrawlDoc(6L, clean2),
        // near-copy of REJECTED doc 4: rejected docs index no spans, so
        // this is judged on its own (and rejected as repetitive itself)
        CrawlDoc(7L, Seq.fill(14)("buy now limited offer").mkString(" "))))
      q.processAllAvailable()
    } finally q.stop()

    val reasons = spark.read.parquet(s"$dir/decisions")
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(reasons(1L) == "ok")
    assert(reasons(2L) == "too_short")
    assert(reasons(3L) == "pii")
    assert(reasons(4L) == "repetitive")
    assert(reasons(5L) == "dup", s"cross-batch span dup missed: ${reasons(5L)}")
    assert(reasons(6L) == "ok")
    assert(reasons(7L) == "repetitive")

    // span index holds exactly the accepted docs' distinct spans
    val expected = Seq(clean1, clean2)
      .toDF("text").select(explode(graft.queries.Curation.spanHashArr(col("text"))))
      .distinct().count()
    assert(spark.read.parquet(s"$dir/spans").select("__h").distinct().count() == expected)
  }

  test("duplicate index digests do not inflate the known-span ratio") {
    // doc shares a prefix with clean1 → some spans known, some novel
    val batch = Seq((9L, s"$clean1 thirteen fourteen")).toDF("doc_id", "text")
    val spans = Seq(clean1).toDF("text")
      .select(explode(graft.queries.Curation.spanHashArr(col("text"))).as("__h"))
    // the same digests three times over — epoch re-index / compaction
    // leftovers; set semantics must make this equivalent to one copy
    val tripled = spans.union(spans).union(spans)
    def ratio(idx: org.apache.spark.sql.DataFrame) =
      CurationGate.decide(batch, "doc_id", "text", idx, CurationGate.Rules())
        .select("known_span_ratio").as[Double].head()
    val clean = ratio(spans)
    assert(clean > 0.0 && clean < 1.0, s"fixture should be partial overlap: $clean")
    assert(ratio(tripled) == clean)
  }

  test("null or empty text fails too_short instead of null-propagating to ok") {
    val batch = Seq[(Long, String)]((1L, null), (2L, ""), (3L, clean1))
      .toDF("doc_id", "text")
    val none = spark.emptyDataFrame.select(lit("").as("__h")).limit(0)
    val reasons = CurationGate.decide(batch, "doc_id", "text", none,
        CurationGate.Rules())
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(reasons(1L) == "too_short")
    assert(reasons(2L) == "too_short")
    assert(reasons(3L) == "ok")
  }

  test("replayed epoch decides identically against its pre-crash index view") {
    val dir = Files.createTempDirectory("curation_gate_replay").toString
    val docs = Seq(CrawlDoc(1L, clean1), CrawlDoc(2L, clean2))
    // same batch through two streams sharing paths but not checkpoints —
    // run 2 replays epoch 0 with run 1's span partition already on disk
    for (run <- 1 to 2) {
      val input = MemoryStream[CrawlDoc](spark)
      val q = CurationGate.start(input.toDF(), "doc_id", "text",
        s"$dir/spans", s"$dir/decisions", s"$dir/ckpt$run")
      try { input.addData(docs); q.processAllAvailable() } finally q.stop()
    }
    val decisions = spark.read.parquet(s"$dir/decisions")
      .select("doc_id", "reason").as[(Long, String)].collect().toSeq.sorted
    // without the own-epoch exclusion the replay would see its own spans
    // and reject both docs as dup
    assert(decisions == Seq((1L, "ok"), (2L, "ok")))
  }

  test("schema-drifted span index fails LOUDLY, not silent degrade") {
    // Plant a span epoch whose __h column is the wrong type. The old
    // broad `catch AnalysisException → empty` silently forgot every
    // committed span on exactly this — the gate re-admitted every dup.
    val dir = Files.createTempDirectory("curation_drift").toString
    Seq(1L, 2L).toDF("__h").write.parquet(s"$dir/spans/__batch=99")
    val input = MemoryStream[CrawlDoc](spark)
    val q = CurationGate.start(input.toDF(), "doc_id", "text",
      s"$dir/spans", s"$dir/decisions", s"$dir/ckpt")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try { input.addData(Seq(CrawlDoc(1L, clean1))); q.processAllAvailable() }
      finally q.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(_.isInstanceOf[org.apache.spark.sql.AnalysisException]),
      s"expected a propagated AnalysisException, got: $err")
    assert(!new java.io.File(s"$dir/decisions/__batch=0").exists ||
      spark.read.parquet(s"$dir/decisions").isEmpty)
  }

  test("existing-but-footerless span index reads as empty, not a query kill") {
    val dir = Files.createTempDirectory("curation_footerless").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/spans"))
    val input = MemoryStream[CrawlDoc](spark)
    val q = CurationGate.start(input.toDF(), "doc_id", "text",
      s"$dir/spans", s"$dir/decisions", s"$dir/ckpt")
    try {
      input.addData(Seq(CrawlDoc(1L, clean1), CrawlDoc(2L, clean2)))
      q.processAllAvailable()
    } finally q.stop()
    val reasons = spark.read.parquet(s"$dir/decisions")
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(reasons == Map(1L -> "ok", 2L -> "ok"))
  }
}
