package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streamed drift stat must converge to the batch q127 numbers bit
  * for bit once the stream has seen what the batch saw. */
class DriftMonitorSpec extends SparkTestBase {
  import spark.implicits._

  private val B = graft.queries.Modeling.DsirBuckets

  test("streamed KL after all batches equals batch q127 exactly") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
    val expected = graft.queries.Modeling.q127SourceDriftOn(docs)
      .select("source", "n_tok", "kl_micro")
      .as[(String, Long, Long)].collect().toSet

    val base = DriftMonitor.baseline(docs, B)
    val rows = docs.select("source", "text").as[(String, String)].collect()
    val input = MemoryStream[(String, String)](spark)
    val name = s"drift_${System.nanoTime()}"
    val q = DriftMonitor.monitor(
        DriftMonitor.tokenize(input.toDF().toDF("source", "text"), B), base)
      .writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("drift").toString)
      .start()
    try {
      rows.grouped(40).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
    } finally q.stop()

    // per-source token counts only grow, so the final emission is the
    // max-n_tok row of each source
    val streamed = spark.table(name)
      .groupBy("source")
      .agg(max(struct(col("n_tok"), col("kl_micro"))).as("s"))
      .select(col("source"), col("s.n_tok"), col("s.kl_micro"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == expected,
      s"diverged: ${streamed.diff(expected)} vs ${expected.diff(streamed)}")
  }

  test("scala-side bucket matches the SQL hashMod expression") {
    val toks = Seq("alpha", "Beta", "…ünïcödé").toDF("t")
    val sql = toks.select(
        graft.functions.TextFunctions.hashMod("kl:", col("t"), B).cast("int"))
      .as[Int].collect().toSeq
    val local = Seq("alpha", "Beta", "…ünïcödé")
      .map(DriftMonitor.bucketOf(_, B))
    assert(local == sql)
  }

  test("a flooding source's streamed KL rises as its flood arrives") {
    val clean = (1 to 20).map(i => s"w$i").mkString(" ")
    val baseDocs = (1 to 30).map(i => (i.toLong, "s0", clean))
      .toDF("doc_id", "source", "text")
    val base = DriftMonitor.baseline(baseDocs, B)
    val input = MemoryStream[(String, String)](spark)
    val name = s"drift2_${System.nanoTime()}"
    val q = DriftMonitor.monitor(
        DriftMonitor.tokenize(input.toDF().toDF("source", "text"), B), base)
      .writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("drift2").toString)
      .start()
    try {
      input.addData(Seq(("sX", clean))); q.processAllAvailable()
      input.addData((1 to 10).map(_ => ("sX", "spam " * 19 + "spam")))
      q.processAllAvailable()
    } finally q.stop()
    val kls = spark.table(name).where(col("source") === "sX")
      .orderBy("n_tok").select("kl_micro").as[Long].collect()
    assert(kls.length == 2 && kls(1) > kls(0) + 500000,
      s"flood not flagged: ${kls.mkString(",")}")
  }
}
